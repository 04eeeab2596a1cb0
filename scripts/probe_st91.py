"""Two-scale probe for st91 streaming embedding near-dup (VERDICT r9
item 7): wall time and per-trigger cost at sf0.1 (2k vectors) vs sf1
(20k vectors — 10x). The claim under test: per-trigger cost is
O(batch x same-cell index rows) — with cells from a fixed k=16 codebook,
same-cell index rows grow linearly with the corpus, so a 10x corpus at
a FIXED batch count should cost <= ~10x per trigger (and the pair join
stays an equi-join; nothing is corpus² anywhere).

Usage: python scripts/probe_st91.py [small_dir] [big_dir] [out_json]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 SCALE_PROBE_st91.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_st91.json")
    )
    for d in (small, big):
        if not os.path.isdir(d):
            raise SystemExit(f"data dir {d} missing")
    from pymongraph_spark.session import get_spark
    from pymongraph_spark.queries import QUERIES

    spark = get_spark(app_name="sparkgraph-probe-st91")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"small": small, "big": big, "waves": 4}
    for name, sf_dir in (("small", small), ("big", big)):
        times = []
        rows = 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = QUERIES["st91_streaming_embedding_neardup"](spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"cold": times[0], "warm": times[1], "pairs": rows}
        print(f"# [{name}] st91: {times} ({rows} pairs)", file=sys.stderr, flush=True)
    out["ratio_warm"] = round(out["big"]["warm"] / out["small"]["warm"], 2)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
