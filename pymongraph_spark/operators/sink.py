"""Sharded dataset sink — the writer half of t72's shard manifest: lay a
corpus out as deterministic md5-hash shards on disk, the layout a
training job's data loader consumes (one directory per shard, bounded
file sizes, a manifest to plan reads against).

Scale shape: shard assignment is a pure per-row expression (no shuffle
beyond the one repartition that co-locates each shard's rows so every
shard directory is written by one task wave); ``maxRecordsPerFile``
bounds file sizes without a global sort. The manifest is recomputed
FROM THE WRITTEN FILES, so it certifies what actually landed on disk
rather than echoing the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_expr(id_col: str = "doc_id", n_shards: int = 8):
    """Deterministic engine-neutral shard id: first 8 md5 hex digits of
    the id, mod n_shards — identical to t72's manifest assignment, so a
    written layout and a planned manifest always agree."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as hash-sharded parquet under ``path`` (hive layout
    ``shard_id=N/``) and return the as-written manifest (shard_id,
    n_docs, min/max id) read back from disk.

    ``mode='overwrite'`` (default) REPLACES the whole layout — the
    full-rebuild shape. For incremental corpus growth pass
    ``mode='append'``: the hash assignment is append-stable, so a later
    batch's rows land as new files inside the SAME shard directories and
    no previously written shard is reshuffled or deleted."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    spark = df.sparkSession
    out = df.withColumn("shard_id", shard_expr(id_col, n_shards))
    (
        out.repartition("shard_id")
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard_id")
        .parquet(path)
    )
    return shard_manifest_from_disk(spark, path, id_col)


def shard_manifest_from_disk(
    spark: SparkSession, path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Recompute the manifest from the written files — certifies the
    on-disk layout (partition pruning applies when a loader asks for one
    shard)."""
    back = spark.read.parquet(path)
    return back.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min(id_col).alias(f"min_{id_col}"),
        F.max(id_col).alias(f"max_{id_col}"),
    )
