"""Bucketing proof for the SCALE.md claim: pre-bucketing vertices by id
and edges by src (same bucket count) makes the frontier-expansion join
shuffle-free — the physical plan joins bucket-to-bucket with no Exchange
on the bucketed sides.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_eliminates_shuffle(spark, tmp_path, sf_small):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped at the end
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path

    from pymongraph_spark.catalog import load_tables

    t = load_tables(spark, sf_small)
    verts = t["customer"].select((F.col("c_custkey") * 4).alias("id"), F.col("c_name"))
    edges = t["orders"].select(
        (F.col("o_custkey") * 4).alias("src"), (F.col("o_orderkey") * 4 + 1).alias("dst")
    )
    verts.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bk_vertices")
    edges.write.bucketBy(8, "src").sortBy("src").mode("overwrite").saveAsTable("bk_edges")

    bv = spark.table("bk_vertices")
    be = spark.table("bk_edges")

    joined = be.join(bv, be.src == bv.id)
    plan = _plan(joined)
    # co-located bucketed join: no Exchange feeding the join
    assert "Exchange" not in plan, plan[:2000]
    n = joined.count()
    assert n > 0

    # control: the same join on unbucketed frames DOES shuffle
    plain = edges.join(verts, edges.src == verts.id)
    plain_plan = _plan(plain)
    assert "Exchange" in plain_plan

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS bk_vertices")
    spark.sql("DROP TABLE IF EXISTS bk_edges")
