"""One-time backfill of GATE_FPS.json from past rounds' git trees
(VERDICT r12 item 2): the code the driver gated as round N is the tree
at the "round N: verdict/advice/correctness/bench" artifact commit (the
driver commits artifacts on top of the round's final code). For each
such commit, check out a temp worktree and run snapshot_gate_fps.py
--print inside it (a subprocess, so each tree imports its own modules),
merging the result under that round's key.

Usage: python scripts/backfill_gate_fps.py [min_round]
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    min_round = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    log = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    rounds: dict[int, str] = {}
    for line in log.splitlines():
        m = re.match(r"([0-9a-f]{40}) round (\d+): verdict", line)
        if m and int(m.group(2)) not in rounds:
            rounds[int(m.group(2))] = m.group(1)
    path = os.path.join(REPO, "GATE_FPS.json")
    data: dict = {"snapshots": {}}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    snaps = data.setdefault("snapshots", {})
    for rnd in sorted(rounds):
        if rnd < min_round or str(rnd) in snaps:
            continue
        sha = rounds[rnd]
        wt = f"/tmp/sparkgraph_fps_r{rnd}"
        shutil.rmtree(wt, ignore_errors=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO, check=True, capture_output=True,
        )
        # inject the CURRENT fingerprint module into the worktree (past
        # trees predate it) so the algorithm is byte-identical, then run
        # it with PYTHONPATH=wt + cwd=wt so the subprocess imports THAT
        # round's query modules, never the current tree's
        shutil.copy(
            os.path.join(REPO, "pymongraph_spark/queries/fingerprints.py"),
            os.path.join(wt, "pymongraph_spark/queries/fingerprints.py"),
        )
        code = (
            "import json, sys\n"
            "from pymongraph_spark.queries.fingerprints import"
            " current_fingerprints\n"
            "json.dump(current_fingerprints(), sys.stdout)\n"
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                cwd=wt, capture_output=True, text=True, timeout=300,
                env={**os.environ, "PYTHONPATH": wt},
            )
            if out.returncode == 0:
                snaps[str(rnd)] = json.loads(out.stdout)
                print(f"r{rnd} ({sha[:8]}): {len(snaps[str(rnd)])} queries")
            else:  # old tree failed to import — skip (safe degradation)
                print(f"r{rnd} ({sha[:8]}): import failed, skipped\n"
                      + out.stderr[-500:])
        finally:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, capture_output=True)
            shutil.rmtree(wt, ignore_errors=True)
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(f"GATE_FPS.json: {sorted(map(int, snaps))}")


if __name__ == "__main__":
    main()
