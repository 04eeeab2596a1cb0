"""st86 stream-stream interval join: state-resident-set profile
(VERDICT r8 item 7).

The registry sweep measured st86 at 1.86x for 10x events — sub-linear,
but the sweep drains the single parquet file in ONE micro-batch, so the
join holds BOTH full streams in the state store for the whole run and
the watermark never gets a chance to evict anything. That conflates two
very different costs:

- structural: the join work itself (pairs within +/-5 min per user);
- state resident set: rows the store must hold between batches, which
  on a real unbounded stream is bounded by watermark_delay + 5 min of
  arrival, NOT by corpus size.

This probe separates them. It stages events time-sorted into K files
(monotone arrival, the realistic shape), drains with
maxFilesPerTrigger=1 so the watermark advances between batches, and
runs the EXACT gated join (streaming.interval_join_streams) at several
watermark delays, recording wall time and the max state rows the store
ever held (sum of stateOperators numRowsTotal across both join sides,
max over batches). If the growth is state-resident-set, max_state_rows
tracks the watermark delay and is FLAT in corpus size; if structural,
it tracks corpus size regardless of watermark.

Usage: python scripts/probe_st86.py [small_dir] [big_dir] [out_json]
Defaults: /root/testdata/sf0.1 /tmp/sparkgraph_sf1 SCALE_PROBE_st86.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 16
WATERMARKS = ["1 minute", "10 minutes", "60 minutes"]


def _stage_sorted(spark, sf_dir: str, base: str) -> str:
    """events sorted by ts and written as N_FILES range-partitioned files
    — monotone event-time arrival, one file per micro-batch.

    The file source processes files in MODIFICATION-TIME order, and a
    parallel write gives every part file the same mtime — the resulting
    arrival order is arbitrary, the watermark jumps to near-max as soon
    as the newest-data file happens to be processed, and every
    older-data file drained after that is late-dropped wholesale (the
    first probe run lost 81% of the expected pairs exactly this way).
    Staging must therefore stamp mtimes ascending in ts-range order:
    part-00000 (lowest ts range) oldest."""
    from pymongraph_spark.catalog import table

    out = os.path.join(base, "events_sorted")
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.parquet(out)
    t0 = time.time() - 10_000
    for i, f in enumerate(sorted(p for p in os.listdir(out) if p.endswith(".parquet"))):
        os.utime(os.path.join(out, f), (t0 + 10 * i, t0 + 10 * i))
    return out


def _run(spark, files_dir: str, watermark: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from pymongraph_spark.queries.streaming import interval_join_streams

    schema = spark.read.parquet(files_dir).schema
    # ONE source instance for both sides (stream self-join): the sides
    # share per-trigger offsets, so trigger k joins file k against file k.
    # Two readStream instances can list files in different orders under
    # maxFilesPerTrigger and join misaligned batches — the first probe
    # run measured exactly that (19% of expected pairs).
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(files_dir)
    )
    joined = interval_join_streams(events, events, watermark=watermark)
    name = f"probe_st86_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    max_state = 0
    batches = 0
    for p in q.recentProgress:
        batches += 1
        ops = p.get("stateOperators") or []
        max_state = max(max_state, sum(op.get("numRowsTotal", 0) for op in ops))
    rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return {
        "wall_s": round(wall, 2),
        "max_state_rows": max_state,
        "batches": batches,
        "out_rows": rows,
    }


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraph_sf1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, "SCALE_PROBE_st86.json")

    from pymongraph_spark.session import get_spark

    spark = get_spark(app_name="sparkgraph-probe-st86")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_files": N_FILES, "small": small, "big": big}
    base = tempfile.mkdtemp(prefix="sparkgraph_st86_")
    try:
        # warm-up: full pipeline once, discarded (codegen + state-store init)
        warm_dir = _stage_sorted(spark, small, os.path.join(base, "warm"))
        _run(spark, warm_dir, "10 minutes")
        for tag, sf_dir in (("sf0.1", small), ("sf1", big)):
            files_dir = _stage_sorted(spark, sf_dir, os.path.join(base, tag))
            # batch ground truth: the same join on the same data with no
            # streaming engine — every streaming run must emit exactly this
            # many rows, or the watermark dropped valid pairs
            from pyspark.sql import functions as F

            bt = spark.read.parquet(files_dir)
            a = bt.select(F.col("event_id").alias("ea"), F.col("user_id").alias("ua"), F.col("ts").alias("ta"))
            b = bt.select(F.col("event_id").alias("eb"), F.col("user_id").alias("ub"), F.col("ts").alias("tb"))
            expected = a.join(
                b,
                (F.col("ua") == F.col("ub"))
                & (F.col("tb") >= F.col("ta") - F.expr("INTERVAL 5 MINUTES"))
                & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 5 MINUTES")),
            ).count()
            per_wm = {"batch_expected_rows": expected}
            for wm in WATERMARKS:
                per_wm[wm] = _run(spark, files_dir, wm)
                per_wm[wm]["complete"] = per_wm[wm]["out_rows"] == expected
                print(f"# {tag} wm={wm}: {per_wm[wm]}", file=sys.stderr)
            out[tag] = per_wm
        # headline ratios: state-set sensitivity to watermark (within a
        # scale) and to corpus (within a watermark)
        out["state_ratio_60min_vs_1min_sf1"] = round(
            out["sf1"]["60 minutes"]["max_state_rows"]
            / max(out["sf1"]["1 minute"]["max_state_rows"], 1),
            2,
        )
        out["state_ratio_sf1_vs_sf0.1_at_10min"] = round(
            out["sf1"]["10 minutes"]["max_state_rows"]
            / max(out["sf0.1"]["10 minutes"]["max_state_rows"], 1),
            2,
        )
        out["wall_ratio_sf1_vs_sf0.1_at_10min"] = round(
            out["sf1"]["10 minutes"]["wall_s"] / out["sf0.1"]["10 minutes"]["wall_s"], 2
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
