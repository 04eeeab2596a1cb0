"""r15 _spread size-gate calibration probe (guide §1: measure first).

Replicates the sf0.1 documents table 16x (~9.5 MB uncompressed-parquet
equivalent) into ONE partition and times the interpreted tokenize+shingle
path with and without the round-robin spread, at 1x and 16x — the two
regimes the 4 MB gate in operators/dedup._spread separates. Recorded
r15 numbers (32-core sandbox): 16x single-core 6.9 s vs spread 3.2 s
(spread wins 2.2x); 1x single-core 0.49 s vs spread 0.34 s isolated, but
a net LOSS inside real queries where the extra stage wave serializes
(d65 2.48 -> 1.35 s with both spreads gated off at sf0.1).

Usage: python scripts/probe_spread_r15.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.functions.text import token_count, tokens, word_shingles
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="probe-spread-r15")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"]
    big = (
        docs.crossJoin(spark.range(16).select(F.col("id").alias("rep")))
        .select((F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    print(f"rows={big.count()} partitions={big.rdd.getNumPartitions()}")

    def sh(d, n=5):
        staged = d.filter(token_count("text") >= n).select(
            "doc_id", tokens("text").alias("__toks")
        )
        return staged.select(
            "doc_id", F.explode(word_shingles(F.col("__toks"), n)).alias("gram")
        )

    def run(label, frame, n=3):
        frame.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: median {sorted(ts)[n // 2]:.3f}s {[round(x, 3) for x in ts]}")

    one = big.filter(F.col("doc_id") % 16 == 0)
    run("1-core shingle 16x corpus", sh(big))
    run("spread shingle 16x corpus", sh(big.repartition(32)))
    run("1-core shingle 1x corpus", sh(one))
    run("spread shingle 1x corpus", sh(one.repartition(32)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
