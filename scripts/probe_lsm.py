"""Log-structured merge mode: compaction cost + crash-replay load
latency (VERDICT r8 item 6).

The LSM mode's SEMANTICS are property-tested (full==log equivalence),
and r8 measured its ingest throughput — but the two amortization claims
were still prose:

- crash replay: a process that dies with N committed-but-uncompacted
  deltas pays a fold of base + N deltas on the next load_log(). The
  fold is one groupBy per entity over the union (never a join per
  delta), so load time should grow with TOTAL ROWS READ (base + N x
  batch), not super-linearly in N.
- compaction: compact_log folds and rewrites the base. Its cost at N
  pending deltas vs the per-batch saving is what justifies
  compact_every=16.

This probe records both curves: seed a base version (BASE_V vertices /
BASE_E edges), append N deltas of BATCH rows each (25% of each delta
overwrites existing vertex ids, so the $set fold does real work), then
time (a) load_log materialization with N pending — the post-crash
number — and (b) compact_log, and (c) the post-compaction load.

Usage: python scripts/probe_lsm.py [out_json]
Default out: SCALE_PROBE_lsm.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_V, BASE_E = 200_000, 400_000
BATCH = 2_000
PENDING = [4, 16, 64]


def _pg(spark, n_v: int, n_e: int, offset: int, tag: str):
    from pyspark.sql import functions as F

    from pymongraph_spark.graph.model import PropertyGraph

    v = spark.range(n_v).select(
        (F.col("id") + offset).alias("id"),
        F.lit("t").alias("label"),
        F.create_map(F.lit("src"), F.lit(tag)).alias("props"),
    )
    e = spark.range(n_e).select(
        (F.col("id") + offset + 10_000_000).alias("id"),
        (F.col("id") + offset).alias("src"),
        ((F.col("id") + offset + 1) % (offset + n_v + 1)).alias("dst"),
        F.lit("e").alias("label"),
        F.lit(None).cast("map<string,string>").alias("props"),
    )
    return PropertyGraph(v, e)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SCALE_PROBE_lsm.json")

    from pymongraph_spark.graph import store
    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-lsm")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"base_vertices": BASE_V, "base_edges": BASE_E, "batch_rows": BATCH}
    # warm-up: one tiny store through the same save/append/fold/compact
    # path so the first measured point isn't charged the per-JVM codegen
    warm = tempfile.mkdtemp(prefix="sparkgraph_lsm_warm_")
    try:
        wpath = os.path.join(warm, "store")
        store.save(_pg(spark, 1000, 2000, 0, "warm"), wpath)
        store.merge_into_log(spark, wpath, _pg(spark, 100, 200, 0, "w0"), batch_id=0, compact_every=10_000)
        g = store.load_log(spark, wpath)
        g.vertices.count(), g.edges.count()
        store.compact_log(spark, wpath)
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    rows: list[dict] = []
    for n_pending in PENDING:
        base = tempfile.mkdtemp(prefix="sparkgraph_lsm_")
        path = os.path.join(base, "store")
        try:
            store.save(_pg(spark, BASE_V, BASE_E, 0, "base"), path)
            append_s = []
            for b in range(n_pending):
                # 25% of the delta overwrites existing vertex ids (offset
                # inside the base range), 75% is new — the fold does real
                # $set work, not pure append
                offset = (b * BATCH * 3) // 4
                t0 = time.perf_counter()
                store.merge_into_log(
                    spark, path, _pg(spark, BATCH, 2 * BATCH, offset, f"b{b}"),
                    batch_id=b, compact_every=10_000,
                )
                append_s.append(time.perf_counter() - t0)
            # (a) post-crash load: fold of base + n_pending deltas,
            # materialized (count both frames — what any first action pays)
            t0 = time.perf_counter()
            g = store.load_log(spark, path)
            n_v, n_e = g.vertices.count(), g.edges.count()
            load_pending_s = time.perf_counter() - t0
            # (b) compaction at this log depth
            t0 = time.perf_counter()
            store.compact_log(spark, path)
            compact_s = time.perf_counter() - t0
            # (c) post-compaction load (base only)
            t0 = time.perf_counter()
            g2 = store.load_log(spark, path)
            g2.vertices.count(), g2.edges.count()
            load_compacted_s = time.perf_counter() - t0
            rows.append(
                {
                    "deltas_pending": n_pending,
                    "append_mean_s": round(sum(append_s) / len(append_s), 3),
                    "load_pending_s": round(load_pending_s, 2),
                    "compact_s": round(compact_s, 2),
                    "load_compacted_s": round(load_compacted_s, 2),
                    "folded_vertices": n_v,
                    "folded_edges": n_e,
                }
            )
            print(f"# {rows[-1]}", file=sys.stderr)
        finally:
            shutil.rmtree(base, ignore_errors=True)
    out["curve"] = rows
    out["load_ratio_64_vs_4_pending"] = round(
        rows[-1]["load_pending_s"] / rows[0]["load_pending_s"], 2
    )
    out["compact_ratio_64_vs_4_pending"] = round(
        rows[-1]["compact_s"] / rows[0]["compact_s"], 2
    )
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
