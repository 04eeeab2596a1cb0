"""Skew-mitigation utilities (SURVEY.md §4 / §7 'What's hard' #3):
power-law keys (hub domains, hot customers) overload single shuffle
partitions. AQE's skew-join splitting covers sort-merge joins; these
helpers cover the cases it doesn't — aggregations and broadcast-infeasible
joins — with explicit salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sum_col: Column | str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe ``groupBy(keys).agg(sum, count)``: salt → partial
    sum/count per (keys, salt) → final sum of partials per keys.
    Decimal-exact so the result is identical to the unsalted plan."""
    c = F.col(sum_col) if isinstance(sum_col, str) else sum_col
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(c.cast("decimal(38,6)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").cast("double").alias("sum_value"),
        F.sum("__pcnt").alias("count_value"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join when ``small`` is too large to broadcast
    and ``big`` has hot keys: salt the big side randomly, replicate the
    small side across all salt values, join on (key, salt). Row multiplicity
    is preserved exactly; only partition placement changes."""
    big_s = big.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, on=[key, "__salt"]).drop("__salt")
    return out
