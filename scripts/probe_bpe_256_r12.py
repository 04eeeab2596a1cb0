"""Re-run the 256-merge incremental-trainer probe on a vocabulary that
SUSTAINS 256 merges (VERDICT r11 item 6): the r11 probe exhausted at 89
merges because the synthetic corpus holds only 31 distinct words — the
whole vocabulary collapses to single symbols long before 256.

Enrichment: append ``' ' || md5(doc_id)`` to every document JVM-side —
one deterministic, cross-engine-reproducible 32-char hex word per doc
(5k distinct words at sf0.1, charset [0-9a-f]), which no realistic merge
budget can exhaust. The probe claim is unchanged (per-merge wall-clock
flat-or-declining, the Sennrich incremental maintenance shape); the
corpus is only widened so the claim is measured over the FULL requested
range instead of 89 points.

The learned table is dumped in full into the artifact — it is the frozen
merge table t106's production encoder ships as a plan constant
(pymongraph_spark/functions/bpe_frozen.py is generated from this run).

Usage: python scripts/probe_bpe_256_r12.py [sf_dir] [n_merges] [out_json]
Defaults: /root/testdata/sf0.1 256 SCALE_PROBE_bpe_r12.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def enriched_docs(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from pymongraph_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return docs.select(
        "doc_id",
        F.concat(
            F.lower("text"), F.lit(" "), F.md5(F.col("doc_id").cast("string"))
        ).alias("text"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out_path = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "SCALE_PROBE_bpe_r12.json")
    )
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"data dir {sf_dir} missing")
    from pymongraph_spark.functions.text import bpe_learn_merges
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-bpe256-r12")
    spark.sparkContext.setLogLevel("ERROR")
    docs = enriched_docs(spark, sf_dir)

    timings: list[float] = []
    t0 = time.perf_counter()
    merges = bpe_learn_merges(docs, n_merges=n_merges, timings=timings)
    rows = merges.orderBy("step").collect()
    total = time.perf_counter() - t0

    q = max(1, len(timings) // 4)
    quartiles = [round(sum(timings[i * q : (i + 1) * q]) / q, 4) for i in range(4)]
    out = {
        "sf_dir": sf_dir,
        "corpus": "documents.text lowered + ' ' + md5(doc_id) (vocab-sustaining)",
        "n_merges_requested": n_merges,
        "n_merges_learned": len(rows),
        "total_sec": round(total, 2),
        "per_merge_quartile_means_sec": quartiles,
        "q4_over_q1": round(quartiles[3] / quartiles[0], 3),
        "flat_or_declining": quartiles[3] <= quartiles[0] * 1.1,
        "merges": [
            [r.step, r.left_sym, r.right_sym, int(r.pair_count)] for r in rows
        ],
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "merges"}, indent=1))


if __name__ == "__main__":
    main()
