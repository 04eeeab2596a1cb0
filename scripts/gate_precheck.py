"""Pre-validate the driver's 50-slot correctness gate at sf0.01.

Runs exactly the queries the rotation will put in front of the driver this
round, through the same compare the in-tree parity mirror uses, but at the
driver's scale factor (sf0.01) instead of the unit-test sf0.001. Catches
scale-sensitive drift (time semantics, sampling, percentile ties) before
the driver records a red row.

Usage: python scripts/gate_precheck.py [N] [sf_dir] [tz]

Pass a timezone (e.g. Asia/Tokyo) as the third arg to run the whole
check under a HOSTILE session timezone — the driver builds its own
SparkSession with no UTC guarantee, and the registry's tune() must
repair it per query. 50/50 hostile-TZ was verified in round 5; keep it
verified.
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import re
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _next_round(repo: str) -> int:
    """The round number the driver will stamp on the gates it runs over
    this tree: max existing CORRECTNESS round + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0) + 1


def ensure_fresh_snapshot(repo: str = REPO, round_key: str | None = None) -> bool:
    """Snapshot this tree's fingerprints under the round the driver gates
    next, replacing whatever was stored (VERDICT r13 item 6: snapshot
    freshness was manual — one forgotten refresh after a late-round edit
    silently re-ages the whole changed-since-gate mechanism). Returns
    True when a DIFFERENT snapshot was already stored for that round —
    i.e. a stale snapshot was about to ship; the caller must fail loudly
    so the discrepancy is seen, even though this call already fixed it."""
    from pymongraph_spark.queries.fingerprints import current_fingerprints

    if round_key is None:
        round_key = str(_next_round(repo))
    fps = current_fingerprints()
    path = os.path.join(repo, "GATE_FPS.json")
    data: dict = {"snapshots": {}}
    if os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
    snaps = data.setdefault("snapshots", {})
    stored = snaps.get(round_key)
    snaps[round_key] = fps
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    return stored is not None and stored != fps

spec = importlib.util.spec_from_file_location(
    "_entry", os.path.join(REPO, "__spark_entry__.py")
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

from pymongraph_spark.queries import ORACLES, QUERIES  # noqa: E402
from pymongraph_spark.session import get_spark  # noqa: E402

from tests.test_oracle_parity import _compare  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    tz = sys.argv[3] if len(sys.argv) > 3 else None
    stale_snapshot = ensure_fresh_snapshot()
    if stale_snapshot:
        print(
            "WARNING: GATE_FPS.json carried a STALE snapshot for the "
            "upcoming round (tree edited after it was taken). It has been "
            "refreshed — re-run gate_precheck to confirm a clean pass.",
            flush=True,
        )
    gate = list(entry.queries())[:n]
    if tz:
        from pyspark.sql import SparkSession

        # getOrCreate silently ignores builder configs when a session
        # already exists in the process — the "hostile TZ" run would then
        # execute under the default timezone while reporting success
        # (ADVICE r5 #5). Fail loudly, and pin the tz on the session we
        # actually got so the guarantee holds either way.
        assert SparkSession.getActiveSession() is None, (
            "gate_precheck's hostile-TZ mode needs a fresh process: an "
            "active SparkSession would swallow the timezone config"
        )
        spark = (
            SparkSession.builder.master("local[16]")
            .config("spark.sql.session.timeZone", tz)
            .config("spark.driver.memory", "12g")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.conf.set("spark.sql.session.timeZone", tz)
        assert spark.conf.get("spark.sql.session.timeZone") == tz
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark()
    failed: list[str] = []
    for i, name in enumerate(gate):
        t0 = time.time()
        try:
            if name in ORACLES:
                _compare(name, spark, sf_dir)
                status = "match"
            else:
                cnt = QUERIES[name](spark, sf_dir).count()
                status = f"rows-only ({cnt})"
        except Exception as exc:  # noqa: BLE001 — report-and-continue harness
            status = f"FAIL: {exc}"
            failed.append(name)
            traceback.print_exc()
        print(f"[{i + 1}/{len(gate)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"\n{len(gate) - len(failed)}/{len(gate)} ok; failures: {failed}")
    if stale_snapshot:
        print("RESULT: FAIL — stale GATE_FPS snapshot (now refreshed)")
    return 1 if (failed or stale_snapshot) else 0


if __name__ == "__main__":
    raise SystemExit(main())
