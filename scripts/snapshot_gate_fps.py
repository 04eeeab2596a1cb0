"""Record the registry's query fingerprints into GATE_FPS.json under a
round key — the fingerprint-at-last-gate map the change-aware rotation
compares against (VERDICT r12 item 2; see queries/fingerprints.py).

Protocol: at the END of each build round, after the final code change,
run  `python scripts/snapshot_gate_fps.py <next_round>`  where
<next_round> = (max existing CORRECTNESS_r*.json round) + 1 — the round
number the driver will stamp on the gates it runs over this tree.
Forgetting a snapshot is safe (affected queries degrade to the old
last-gated-round-only ranking); a wrong snapshot only mis-ranks.

Modes:
  snapshot_gate_fps.py <round>            merge current tree's fps into
                                          GATE_FPS.json under <round>
  snapshot_gate_fps.py <round> --print    print fps JSON to stdout only
                                          (used by backfill over git
                                          worktrees of past rounds)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    round_key = sys.argv[1]
    int(round_key)  # must be a round number
    from pymongraph_spark.queries.fingerprints import current_fingerprints

    fps = current_fingerprints()
    if "--print" in sys.argv[2:]:
        json.dump(fps, sys.stdout)
        return
    path = os.path.join(REPO, "GATE_FPS.json")
    data: dict = {"snapshots": {}}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    data.setdefault("snapshots", {})[round_key] = fps
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(f"GATE_FPS.json: snapshot r{round_key} = {len(fps)} queries")


if __name__ == "__main__":
    main()
