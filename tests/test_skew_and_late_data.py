"""Skew-mitigation equivalence tests and streaming late-data semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongraph_spark.operators.skew import salted_join, salted_sum_count


def _skewed_df(spark, n_hot=5000, n_tail=500):
    # one hot key (0) with n_hot rows, plus a uniform tail
    hot = spark.range(n_hot).select(F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v"))
    tail = spark.range(n_tail).select((F.col("id") % 50 + 1).alias("k"), F.col("id").cast("double").alias("v"))
    return hot.unionByName(tail)


def test_salted_sum_count_equals_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(38,6)")).cast("double").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r["k"]: (r["sum_value"], r["count_value"])
        for r in salted_sum_count(df, ["k"], "v", salt_buckets=16).collect()
    }
    assert plain == salted  # decimal-exact → identical despite salting


def test_salted_join_preserves_multiplicity(spark):
    big = _skewed_df(spark)
    small = spark.range(51).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = big.join(small, on="k").groupBy("k").agg(F.count("*").alias("n"), F.sum("w").alias("sw"))
    salted = salted_join(big, small, "k", salt_buckets=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    a = {r["k"]: (r["n"], r["sw"]) for r in plain.collect()}
    b = {r["k"]: (r["n"], r["sw"]) for r in salted.collect()}
    assert a == b


def test_streaming_late_data_dropped_by_watermark(spark, tmp_path):
    """Events older than the watermark must be excluded from finalized
    windows in append mode: batch 1 advances the watermark far ahead,
    batch 2 delivers a too-late event, which Spark drops."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    out_name = f"late_{abs(hash(str(tmp_path))) % 10**6}"

    schema = "ts timestamp, k string, v double"
    def write_batch(fname, rows):
        df = spark.createDataFrame(rows, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage" / fname))
        import shutil, glob, os
        part = glob.glob(str(tmp_path / "stage" / fname / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{fname}.parquet"))

    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    write_batch("b1", [(t0, "a", 1.0), (t0 + dt.timedelta(hours=5), "a", 2.0)])

    out_dir = str(tmp_path / "out")

    def run_trigger():
        stream = (
            spark.readStream.schema(schema).parquet(str(src))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "k", "n")
        )
        # file sink: append-mode + checkpoint recovery across restarts
        # (memory sink can't recover, and append is what drops late rows)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_trigger()
    # batch 2: an event in the hour-0 window — 4h older than the watermark
    write_batch("b2", [(t0 + dt.timedelta(minutes=30), "a", 99.0),
                       (t0 + dt.timedelta(hours=6), "a", 3.0)])
    run_trigger()

    rows = {(r["ws"].hour, r["k"]): r["n"] for r in spark.read.parquet(out_dir).collect()}
    # hour-0 window finalized with count 1 — the late 00:30 event was DROPPED
    assert rows.get((0, "a")) == 1, rows
