"""Streaming ingest (SURVEY.md §2.11): the reference has no streaming at
all — ingestion is synchronous per-document RPCs. Here the same staging
transform as batch (importer.py) runs per micro-batch under Structured
Streaming, with ``foreachBatch`` merging into the parquet graph store.

Exactly-once-effective: ids are pure functions of natural keys and the
store merge is an idempotent upsert, so micro-batch replays after failure
converge to the same graph.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pymongraph_spark.graph import store
from pymongraph_spark.ingest.importer import build_graph_tables, staging_frame


def stream_import(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    merge_mode: str = "full",
    compact_every: int = 16,
) -> StreamingQuery:
    """Watch ``input_dir`` for text files (one JSON report per line) and
    continuously upsert them into the graph store at ``store_path``.

    ``available_now=True`` drains what exists and stops (deterministic for
    tests/backfills); False runs a continuous micro-batch stream.
    ``max_files_per_trigger`` caps files per micro-batch — with
    availableNow this slices a backfill into several idempotent merges
    (the replay/convergence story under test in st87).

    ``merge_mode``: "full" is the read-merge-rewrite version-swap store
    (O(accumulated store) per batch — right for backfills and bounded
    stores). "log" appends each micro-batch as an immutable delta and
    compacts every ``compact_every`` batches (store.merge_into_log) —
    O(batch) per micro-batch, the long-running-stream mode; read the
    current state with store.load_log. Identical final semantics
    (test_streaming_ingest pins full == log on the same fixture).

    ARRIVAL ORDER: the file source processes files in mtime order, and
    batch order is what $set merge resolution follows — two reports
    updating the same vertex resolve last-batch-wins. Files tied at
    millisecond mtime granularity (any parallel writer) arrive in
    ARBITRARY order, making that resolution nondeterministic; ties are
    detected loudly BOTH at stream start and per micro-batch for files
    that land while the stream runs (streaming.staging.mtime_tie_monitor
    — the long-running-stream mode is exactly where mid-stream writers
    appear). Backfills should be staged with
    streaming.staging.stamp_monotone_mtimes / stage_time_sorted.
    """
    if merge_mode not in ("full", "log"):
        raise ValueError(f"unknown merge_mode {merge_mode!r}; use 'full' or 'log'")
    from pymongraph_spark.streaming.staging import mtime_tie_monitor

    check_ties = mtime_tie_monitor(input_dir, context="stream_import")
    check_ties()  # start-of-stream sweep (covers everything already staged)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(input_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        check_ties()  # files that landed since the last batch
        reports = batch_df.filter(F.length(F.trim("value")) > 0).select(
            F.monotonically_increasing_id().alias("ord"), "value"
        )
        if reports.isEmpty():
            return
        g = build_graph_tables(staging_frame(spark, reports))
        if merge_mode == "log":
            store.merge_into_log(
                spark, store_path, g, batch_id, compact_every=compact_every
            )
        else:
            store.merge_into(spark, store_path, g)

    writer = (
        lines.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
