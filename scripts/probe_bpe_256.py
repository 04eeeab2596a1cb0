"""Per-merge cost probe for the INCREMENTAL BPE trainer (VERDICT r10
item 4): the r10 trainer re-counted the whole vocabulary every merge —
correct but 2 full-vocab jobs x n_merges, hours of sequential driver
round trips at a production 32k-merge vocab. The incremental trainer
(functions/text.py) pair-counts the vocabulary ONCE and then maintains
the counts by delta over only the words CONTAINING each winning pair.

Claim under test: per-merge wall-clock at n_merges=256 is
flat-or-declining — the affected-word fraction shrinks as merges get
rarer, so later merges must not cost more than early ones. Reported as
quartile means over the 256 per-merge timings (q4/q1 <= 1.0 + noise).

Usage: python scripts/probe_bpe_256.py [sf_dir] [n_merges] [out_json]
Defaults: /root/testdata/sf0.1 256 SCALE_PROBE_bpe_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_bpe_r11.json")
    )
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"data dir {sf_dir} missing")
    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.functions.text import bpe_learn_merges
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-bpe256")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"]

    timings: list[float] = []
    t0 = time.perf_counter()
    merges = bpe_learn_merges(docs, n_merges=n_merges, timings=timings)
    rows = merges.collect()
    total = time.perf_counter() - t0

    q = max(1, len(timings) // 4)
    quartiles = [
        round(sum(timings[i * q : (i + 1) * q]) / q, 4) for i in range(4)
    ]
    out = {
        "sf_dir": sf_dir,
        "n_merges_requested": n_merges,
        "n_merges_learned": len(rows),
        "total_sec": round(total, 2),
        "per_merge_quartile_means_sec": quartiles,
        "q4_over_q1": round(quartiles[3] / quartiles[0], 3),
        "flat_or_declining": quartiles[3] <= quartiles[0] * 1.15,
        "first_merges": [
            [r.step, r.merged, r.pair_count] for r in rows[:4]
        ],
        "last_merges": [
            [r.step, r.merged, r.pair_count] for r in rows[-4:]
        ],
    }
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
