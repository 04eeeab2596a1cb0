"""Relational operator surface (SURVEY.md §2.13) as oracle-checked queries.

The reference has no relational layer — its only query surface is a
pass-through Mongo filter (/root/reference/mongraph.py:215-226) and one
client-side avg (/root/reference/graph_importer.py:131-138). Everything here
is the Spark-native surface the north star mandates: scans with pushdown,
all join types, hash aggregation, windows, rollup/cube/grouping sets, set
ops, sorts/top-k, string/date/JSON functions, subqueries, as-of joins.

All float aggregates go through the decimal-exact ``dsum``/``davg`` helpers
(see compat.py) so values hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pymongraph_spark.catalog import load_tables, scratch_dir
from pymongraph_spark.compat import AVG_D, SUM_D, dsum, davg
from pymongraph_spark.queries.registry import query


# --------------------------------------------------------------------------
# Aggregation: TPC-H Q1 shape — scan + filter + hash agg (partial+final).
# Flagship query; the filter pushes down to the parquet scan.
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SUM_D.format('l_quantity')} AS sum_qty,
           {SUM_D.format('l_extendedprice')} AS sum_base_price,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {SUM_D.format('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {AVG_D.format('l_quantity', 'l_quantity')} AS avg_qty,
           {AVG_D.format('l_extendedprice', 'l_extendedprice')} AS avg_price,
           {AVG_D.format('l_discount', 'l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Join + agg + top-k: TPC-H Q3 shape. 3-way join; the deterministic top-10
# uses o_orderkey as the tiebreaker (order-insensitive hash still needs a
# deterministic row SET under ties).
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-way join through the whole star: TPC-H Q5 shape. region and nation
# are broadcast (small dims); customer⋈orders⋈lineitem⋈supplier shuffle on
# their keys; AQE handles skew.
#
# The region restriction is applied EARLY: customer and supplier are
# broadcast-semi-joined against the ASIA nation keys before any fact-table
# join. Catalyst will not reorder inner joins this way without CBO stats,
# and without it customer⋈orders⋈lineitem⋈supplier shuffles the full fact
# volume before 4/5 of nations are discarded at the final dim join — at
# 100× scale that is ~5× needless shuffle.
# --------------------------------------------------------------------------
@query(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    # restrict both nation-keyed tables BEFORE the fact joins: a broadcast
    # semi-join is evaluated at the scan, so 4/5 of customers/suppliers
    # (and transitively their orders and lineitems) never enter a shuffle
    c = t["customer"].join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("c_nationkey") == F.col("n_nationkey"), "left_semi",
    )
    s = t["supplier"].join(
        F.broadcast(asia_nations.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"), "left_semi",
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Window functions: rank / top-k per group (row_number with deterministic
# tiebreak), the Spark mapping for "sorts/limits/top-k" in SURVEY §2.13.
# --------------------------------------------------------------------------
@query(
    "q10_top_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_name, c_acctbal, rnk
    FROM (
      SELECT n_name, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rnk <= 3
    """,
)
def q10_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


# --------------------------------------------------------------------------
# Window functions: running total + lag deltas over an event stream.
# Running sum in exact decimal (cumulative double sums differ between
# engines' frame evaluation order), delta as elementwise double arithmetic.
# --------------------------------------------------------------------------
@query(
    "q11_running_total_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS delta_value
    FROM events
    """,
)
def q11_running_total_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    # nulls_last: Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST —
    # a NULL ts would shift every lag/running value in the partition
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(wsum).cast("double").alias("running_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
    )


# --------------------------------------------------------------------------
# ROLLUP with grouping flags (SURVEY §2.13 "grouping sets / cube / rollup").
# --------------------------------------------------------------------------
@query(
    "q12_rollup_revenue_region_nation",
    oracle=f"""
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           {SUM_D.format('c_acctbal')} AS total_acctbal,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q12_rollup_revenue_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        dsum("c_acctbal").alias("total_acctbal"),
        F.count(F.lit(1)).alias("n_customers"),
    ).select("r_name", "n_name", "g_region", "g_nation", "total_acctbal", "n_customers")


# --------------------------------------------------------------------------
# CUBE over order attributes.
# --------------------------------------------------------------------------
@query(
    "q13_cube_order_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {SUM_D.format('o_totalprice')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q13_cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS via SQL on registered views.
# --------------------------------------------------------------------------
@query(
    "q14_grouping_sets_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items, {SUM_D.format('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q14_grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.13): the reference only does client-side Python
# set unions (/root/reference/mongraph.py:244-245,274).
# --------------------------------------------------------------------------
@query(
    "q15_set_ops_customers",
    oracle="""
    WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM big INTERSECT SELECT * FROM bld)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM big EXCEPT SELECT * FROM bld)
    """,
)
def q15_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    big = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        big.intersect(bld).select(F.lit("intersect").alias("op"), "c_custkey")
        # subtract() IS SQL EXCEPT (set difference). exceptAll().distinct()
        # is NOT: it subtracts multiplicities first, so a key with more
        # copies on the left than the right would survive — a silent
        # divergence on duplicate-key data
        .unionByName(big.subtract(bld)
                     .select(F.lit("except").alias("op"), "c_custkey"))
    )


# --------------------------------------------------------------------------
# Anti join (batch form of the reference's cascade-delete check, SURVEY D1)
# and semi join (dedup probe form, SURVEY W1/W2).
# --------------------------------------------------------------------------
@query(
    "q16_customers_without_orders",
    # anti-join against big-ticket orders (every customer has SOME order in
    # the synthetic data, so the unfiltered variant is vacuously empty)
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def q16_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return t["customer"].join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q17_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q17_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return t["customer"].join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Distinct aggregation.
# --------------------------------------------------------------------------
@query(
    "q18_distinct_suppliers_per_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q18_distinct_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )


# --------------------------------------------------------------------------
# Scalar subquery: orders above the (decimal-exact) global average price.
# --------------------------------------------------------------------------
@query(
    "q19_orders_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                                 / COUNT(o_totalprice) FROM orders)
    """,
)
def q19_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    avg_df = o.agg(davg("o_totalprice").alias("thresh"))
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("thresh"))
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# String + date functions: monthly order stats with string-formatted month
# (timestamps are exported as strings so both engines hash identically).
# --------------------------------------------------------------------------
@query(
    "q20_monthly_order_stats",
    oracle=f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           {SUM_D.format('o_totalprice')} AS total_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY 1
    """,
)
def q20_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


# --------------------------------------------------------------------------
# String functions over part names.
# --------------------------------------------------------------------------
@query(
    "q21_string_functions_part",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           CASE WHEN regexp_matches(p_type, '^PROMO') THEN 1 ELSE 0 END AS is_promo,
           replace(p_type, ' ', '_') AS type_slug
    FROM part
    """,
)
def q21_string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir)["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.when(F.col("p_type").rlike("^PROMO"), 1).otherwise(0).alias("is_promo"),
        F.regexp_replace("p_type", " ", "_").alias("type_slug"),
    )


# --------------------------------------------------------------------------
# JSON functions over events.props (SURVEY §2.13 "array/map/json fns").
# --------------------------------------------------------------------------
@query(
    "q22_json_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(json_extract_string(props, '$.k')) AS avg_k
    FROM events GROUP BY event_type
    """,
)
def q22_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    # try_cast both sides (q83's standard): a non-numeric or wider k is
    # NULL-and-skipped, not a DuckDB ConversionException / Spark ANSI abort
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(k)).alias("avg_k"),
    )


# --------------------------------------------------------------------------
# Global top-k (TakeOrderedAndProject physical op).
# --------------------------------------------------------------------------
@query(
    "q23_top_lineitems_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q23_top_lineitems_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# As-of join (SURVEY §2.13 "range/as-of joins"): for each purchase event,
# the user's most recent signup at-or-before it. Implemented the scalable
# way — union both streams, one window pass carrying the last signup ts
# forward — not a per-row correlated lookup.
# --------------------------------------------------------------------------
@query(
    "q24_asof_purchase_signup",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           (SELECT max(s.ts) FROM events s
             WHERE s.user_id = p.user_id AND s.event_type = 'signup'
               AND s.ts IS NOT NULL
               AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id <= p.event_id)))
             IS NOT NULL AS has_prior_signup,
           CAST(date_diff('second',
               (SELECT max(s.ts) FROM events s
                 WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                   AND s.ts IS NOT NULL
                   AND (s.ts < p.ts OR (s.ts = p.ts AND s.event_id <= p.event_id))),
               p.ts) AS BIGINT) AS secs_since_signup
    FROM events p WHERE p.event_type = 'purchase' AND p.ts IS NOT NULL
    """,
)
def q24_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the window's ROWS frame is ordered by (ts, event_id), so a signup
    # SHARING the purchase's timestamp is "prior" only when its event_id
    # is lower — the oracle spells out that exact tuple condition instead
    # of a bare s.ts <= p.ts (which would include same-ts LATER signups).
    # Timestampless events are excluded on both sides: engines disagree
    # on NULL ordering inside windows, and an as-of against no timestamp
    # is meaningless anyway.
    e = load_tables(spark, sf_dir)["events"].filter(F.col("ts").isNotNull())
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("last_signup_ts", F.max("signup_ts").over(w))
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("last_signup_ts").isNotNull().alias("has_prior_signup"),
        (F.unix_timestamp("ts") - F.unix_timestamp("last_signup_ts"))
        .cast("bigint")
        .alias("secs_since_signup"),
    )


# --------------------------------------------------------------------------
# Array functions: per-order sorted array of quantities + stats.
# --------------------------------------------------------------------------
@query(
    "q25_array_functions",
    # the collected array is serialized to a string for the compare —
    # array-valued result columns depend on the harness's hash handling
    # of nested types; the array ops (collect/sort/size/index) are still
    # what's exercised
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
           CAST(len(list(l_linenumber)) AS INT) AS n_lines,
           CAST(list_sort(list(l_linenumber))[1] AS INT) AS first_line
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q25_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return l.groupBy("l_orderkey").agg(
        F.concat_ws(",", arr).alias("linenumbers"),
        F.size(F.collect_list("l_linenumber")).alias("n_lines"),
        arr.getItem(0).alias("first_line"),
    )


# --------------------------------------------------------------------------
# Scalar functions from the reference importer (SURVEY §2.8 F1/F3) over
# synthesized strings: IPv4 classification regex and "x/y" ratio parsing
# with null-on-malformed (B8 intent).
# --------------------------------------------------------------------------
@query(
    "q26_scalar_functions",
    oracle="""
    WITH s AS (
      SELECT o_orderkey,
             '10.' || CAST(o_orderkey % 300 AS VARCHAR) || '.0.' || CAST(o_custkey % 260 AS VARCHAR) AS addr,
             CAST(o_orderkey % 7 AS VARCHAR) || '/' || CAST(o_custkey % 5 AS VARCHAR) AS ratio_str
      FROM orders
    )
    SELECT o_orderkey,
           regexp_matches(addr, '^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\\.){3}([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$') AS is_ip,
           CASE WHEN regexp_matches(addr, '^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\\.){3}([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$')
                THEN 'ip' ELSE 'domain' END AS resource_label,
           CASE WHEN len(string_split(trim(ratio_str), '/')) = 2
                 AND regexp_matches(trim(string_split(trim(ratio_str), '/')[1]), '^[+-]?[0-9]+$')
                 AND regexp_matches(trim(string_split(trim(ratio_str), '/')[2]), '^[+-]?[0-9]+$')
                 AND TRY_CAST(string_split(trim(ratio_str), '/')[2] AS DOUBLE) <> 0
                THEN TRY_CAST(trim(string_split(trim(ratio_str), '/')[1]) AS DOUBLE)
                     / TRY_CAST(trim(string_split(trim(ratio_str), '/')[2]) AS DOUBLE)
           END AS ratio
    FROM s
    """,
)
def q26_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.functions.scalars import classify_resource, is_ipv4, parse_ratio

    o = load_tables(spark, sf_dir)["orders"]
    s = o.select(
        "o_orderkey",
        F.concat(
            F.lit("10."), (F.col("o_orderkey") % 300).cast("string"),
            F.lit(".0."), (F.col("o_custkey") % 260).cast("string"),
        ).alias("addr"),
        F.concat(
            (F.col("o_orderkey") % 7).cast("string"), F.lit("/"),
            (F.col("o_custkey") % 5).cast("string"),
        ).alias("ratio_str"),
    )
    return s.select(
        "o_orderkey",
        is_ipv4("addr").alias("is_ip"),
        classify_resource("addr").alias("resource_label"),
        parse_ratio("ratio_str").alias("ratio"),
    )


# --------------------------------------------------------------------------
# Window extras: dense_rank, ntile, and a rangeBetween moving aggregate
# (decimal-exact inside the frame).
# --------------------------------------------------------------------------
@query(
    "q27_window_extras",
    oracle="""
    SELECT s_suppkey,
           DENSE_RANK() OVER (ORDER BY s_nationkey) AS nation_dense_rank,
           NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS acctbal_quartile,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6)))
                OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
    FROM supplier
    """,
)
def q27_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_tables(spark, sf_dir)["supplier"]
    w_rank = Window.orderBy("s_nationkey")
    w_tile = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    w_move = Window.partitionBy("s_nationkey").orderBy("s_suppkey").rowsBetween(-2, 0)
    return s.select(
        "s_suppkey",
        F.dense_rank().over(w_rank).alias("nation_dense_rank"),
        F.ntile(4).over(w_tile).alias("acctbal_quartile"),
        F.sum(F.col("s_acctbal").cast("decimal(38,6)")).over(w_move).cast("double").alias("moving_sum"),
    )


# --------------------------------------------------------------------------
# Pivot: order counts per month × status (fixed value list both sides).
# --------------------------------------------------------------------------
@query(
    "q28_pivot_status_by_month",
    oracle="""
    PIVOT (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
             o_orderstatus
      FROM orders
    ) ON o_orderstatus IN ('O', 'F', 'P') USING COUNT(*)
    ORDER BY order_month
    """,
)
def q28_pivot_status_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("order_month"),
            "o_orderstatus",
        )
        .groupBy("order_month")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        # empty cells: Spark pivot yields null, DuckDB PIVOT yields 0
        .select(
            "order_month",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["O", "F", "P"]],
        )
    )


# --------------------------------------------------------------------------
# approx_count_distinct (HLL++): engine-specific sketches can't hash-match
# across engines → rows-only gate; q58 runs the EXACT count_distinct over
# the identical grouping as the oracle-checked anchor (the HLL estimate at
# rsd=0.01 must land within ~3% of q58's exact counts).
# --------------------------------------------------------------------------
@query("q29_approx_count_distinct")
def q29_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("approx_suppliers"),
    )


@query(
    "q58_exact_distinct_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q58_exact_distinct_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29's exact twin: same grouping, exact distinct counts, full oracle.
    Expands to a 2-phase distinct aggregation (partial per partition key,
    then final) — the exact-tier plan; q29's HLL sketch is the scale tier."""
    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_suppliers"),
    )


@query(
    "q92_hll_error_bound",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_suppliers,
           1 AS parts_within_3rsd,
           1 AS suppliers_within_3rsd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q92_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q29's quality bound (VERDICT r10 item 3): the HLL estimate must sit
    within 3×rsd of the exact distinct count, per group and per column —
    a sketch-quality collapse (wrong relativeSD plumbing, merge bug)
    turns the flag 0 and the row red, where q29's rows-only gate stayed
    green. Measured max relative error 0.0067 across sf0.001-0.1 at
    rsd=0.01; the 0.03 bound is the standard 3-sigma envelope. Hashed
    outputs are the exact counts + integer flags — nothing
    approximation-valued reaches the hash."""
    l = load_tables(spark, sf_dir)["lineitem"]
    j = l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("__ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("__as"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(0.03) * F.col(e)
    ).cast("int")
    return j.select(
        "l_returnflag",
        "exact_parts",
        "exact_suppliers",
        within("__ap", "exact_parts").alias("parts_within_3rsd"),
        within("__as", "exact_suppliers").alias("suppliers_within_3rsd"),
    )


# --------------------------------------------------------------------------
# File formats (SURVEY §2.13 row 1): the same relation written to and read
# back from CSV, JSON, and ORC must aggregate identically to the parquet
# original — exercising spark.read/write for every format in one query.
# --------------------------------------------------------------------------
@query(
    "q31_multiformat_roundtrip",
    oracle=f"""
    SELECT 'csv' AS fmt, l_returnflag, COUNT(*) AS n, {SUM_D.format('l_quantity')} AS sum_qty
    FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_returnflag
    UNION ALL
    SELECT 'json', l_returnflag, COUNT(*), {SUM_D.format('l_quantity')}
    FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_returnflag
    UNION ALL
    SELECT 'orc', l_returnflag, COUNT(*), {SUM_D.format('l_quantity')}
    FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_returnflag
    """,
)
def q31_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    l = (
        load_tables(spark, sf_dir)["lineitem"]
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_returnflag", "l_quantity")
    )
    base = scratch_dir("fmt", sf_dir)
    out = None
    for fmt in ["csv", "json", "orc"]:
        path = os.path.join(base, fmt)
        writer = l.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", "true")
        writer.save(path)
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true").schema(l.schema)
        back = reader.load(path)
        agg = back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
        ).select(F.lit(fmt).alias("fmt"), "l_returnflag", "n", "sum_qty")
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# HAVING + conditional aggregation (CASE WHEN inside SUM/COUNT).
# --------------------------------------------------------------------------
@query(
    "q32_having_conditional_agg",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS n_urgent,
           {SUM_D.format("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS filled_value
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    """,
)
def q32_having_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
            dsum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(F.lit(0.0))).alias("filled_value"),
        )
        .filter(F.col("n_orders") >= 8)
    )


# --------------------------------------------------------------------------
# Date arithmetic: datediff / date_add / extract / day-of-week.
# --------------------------------------------------------------------------
@query(
    "q33_date_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS days_to_ship,
           strftime(l_shipdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(EXTRACT(quarter FROM l_shipdate) AS INT) AS ship_quarter,
           CAST(dayofweek(l_shipdate) AS INT) AS ship_dow
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey % 50 = 0
    """,
)
def q33_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_orderkey") % 50 == 0)
    return (
        l.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).cast("bigint").alias("days_to_ship"),
            F.date_format(F.date_add(F.to_date("l_shipdate"), 30), "yyyy-MM-dd").alias("due_date"),
            F.year("l_shipdate").alias("ship_year"),
            F.quarter("l_shipdate").alias("ship_quarter"),
            # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday
            (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: IN-subquery over a grouped HAVING (large-quantity
# orders), then a 3-way join for reporting.
# --------------------------------------------------------------------------
@query(
    "q34_large_quantity_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           {SUM_D.format('l_quantity')} AS total_qty,
           o_totalprice
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 250
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q34_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"].groupBy("l_orderkey")
        # dsum, not a raw double sum: l_quantity is DOUBLE in the parquet,
        # and an order straddling the 250 threshold by one ulp of
        # accumulation order would flip membership between engines
        .agg(dsum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        t["lineitem"].join(big.withColumnRenamed("l_orderkey", "__k"),
                           F.col("l_orderkey") == F.col("__k"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select("c_custkey", "o_orderkey", "total_qty", "o_totalprice")
    )


# --------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral trade volume between two nations per ship
# year (multi-join + CASE-constrained nation pair + year extraction).
# --------------------------------------------------------------------------
@query(
    "q35_nation_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {SUM_D.format('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q35_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(F.col("n_nationkey").alias("__nk1"), F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("cust_nation"))
    joined = (
        t["supplier"]
        .join(t["lineitem"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum("volume").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Range join (SURVEY §2.13 "range/as-of joins"): pairs of events by the
# same user within 5 minutes. Naive form is a per-user theta join; the
# scalable plan buckets time into 5-minute cells and probes the three
# neighboring cells, turning it into an equi-join on (user_id, bucket).
# --------------------------------------------------------------------------
@query(
    "q36_event_pairs_within_5min",
    oracle="""
    SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
           a.user_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_seconds
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(date_diff('second', a.ts, b.ts)) <= 300
    """,
)
def q36_event_pairs_within_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    bucket = (F.unix_timestamp("ts") / 300).cast("long")
    left = e.select(
        F.col("event_id").alias("event_id_a"),
        "user_id",
        F.col("ts").alias("ts_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("__bucket"),
    )
    right = e.select(
        F.col("event_id").alias("event_id_b"),
        F.col("user_id").alias("__uid"),
        F.col("ts").alias("ts_b"),
        bucket.alias("__bucket"),
    )
    gap = F.unix_timestamp("ts_b") - F.unix_timestamp("ts_a")
    return (
        left.join(right, (left.user_id == right.__uid) & (left.__bucket == right.__bucket))
        .filter(F.col("event_id_a") < F.col("event_id_b"))
        .filter(F.abs(gap) <= 300)
        .select("event_id_a", "event_id_b", "user_id", gap.cast("bigint").alias("gap_seconds"))
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — 7-way join (part, supplier,
# lineitem, orders, customer, nation×2, region) with a conditional-sum
# ratio per order year. Both sums are decimal-exact, so the double
# division is bit-identical cross-engine. nation/region are broadcast.
# --------------------------------------------------------------------------
@query(
    "q37_national_market_share",
    oracle=f"""
    SELECT o_year,
           {SUM_D.format("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             / {SUM_D.format('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def q37_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("__nk1"), F.col("n_regionkey").alias("__rk1")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("__nk2"), F.col("n_name").alias("nation")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("__rk")
    )
    joined = (
        t["part"].filter(F.col("p_type") == "ECONOMY")
        .join(t["lineitem"], F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__nk1"))
        .join(F.broadcast(asia), F.col("__rk1") == F.col("__rk"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__nk2"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            # try_divide: a year whose volumes all cancel to 0 is NULL in
            # the oracle; plain / would abort under ANSI
            F.try_divide(
                dsum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))),
                dsum("volume"),
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: potential part promotion — nested semi-join over a
# grouped HAVING (suppliers who shipped > threshold of any matching part),
# joined out to nation for reporting. The semi-join keeps the probe side
# skinny; the grouped subquery is a two-phase hash agg.
# --------------------------------------------------------------------------
@query(
    "q38_potential_part_promotion",
    oracle=f"""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%red%'
      GROUP BY l_suppkey, l_partkey
      HAVING {SUM_D.format('l_quantity')} > 120.0
    )
    """,
)
def q38_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    red_parts = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    heavy_suppliers = (
        t["lineitem"]
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 120.0)
        .select(F.col("l_suppkey").alias("__sk"))
    )
    return (
        t["supplier"]
        .join(heavy_suppliers, F.col("s_suppkey") == F.col("__sk"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive OR-of-ANDs join predicate (brand/size/
# quantity bands). Catalyst extracts the common l_partkey = p_partkey
# equi-condition so the join stays a hash join with the disjunction as a
# post-join filter — the classic Q19 optimizer test.
# --------------------------------------------------------------------------
@query(
    "q39_disjunctive_predicates",
    oracle=f"""
    SELECT {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q39_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 40))
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who were the ONLY problem supplier of a
# multi-supplier order — EXISTS (another supplier in the order) and
# NOT EXISTS (another problem supplier) over the same table, i.e. a
# semi-join and an anti-join against two differently-filtered self-views.
# 'Problem' is l_returnflag = 'R' (the schema has no receipt dates).
# --------------------------------------------------------------------------
@query(
    "q42_sole_problem_supplier",
    oracle="""
    WITH probl AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    allsupp AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT p.l_suppkey AS s_suppkey, COUNT(*) AS numwait
    FROM probl p
    WHERE EXISTS (SELECT 1 FROM allsupp a
                  WHERE a.l_orderkey = p.l_orderkey AND a.l_suppkey <> p.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM probl p2
                      WHERE p2.l_orderkey = p.l_orderkey AND p2.l_suppkey <> p.l_suppkey)
    GROUP BY p.l_suppkey
    """,
)
def q42_sole_problem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_tables(spark, sf_dir)["lineitem"]
    probl = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    allsupp = l.select("l_orderkey", "l_suppkey").distinct()
    p = probl.alias("p")
    other_any = allsupp.alias("a")
    other_probl = probl.alias("p2")
    exists_other = p.join(
        other_any,
        (F.col("p.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("p.l_suppkey") != F.col("a.l_suppkey")),
        "left_semi",
    )
    sole = exists_other.alias("p").join(
        other_probl,
        (F.col("p.l_orderkey") == F.col("p2.l_orderkey"))
        & (F.col("p.l_suppkey") != F.col("p2.l_suppkey")),
        "left_anti",
    )
    return sole.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("numwait")
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: positive-balance customers above the (decimal-exact)
# global average with no RECENT orders (every sf0.01 customer has some
# order, so plain NOT EXISTS would be vacuous) — scalar subquery +
# filtered anti-join, grouped by nation. The average is quantized
# identically in both engines so the boundary comparison can't flake.
# --------------------------------------------------------------------------
@query(
    "q43_dormant_rich_customers",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {SUM_D.format('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT {AVG_D.format('c_acctbal', 'c_acctbal')} FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
    GROUP BY c_nationkey
    """,
)
def q43_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, o = t["customer"], t["orders"]
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal").alias("v")).first()["v"]
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(recent, on="c_custkey", how="left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


# --------------------------------------------------------------------------
# Exact interpolated percentiles per group — data-quality staple. Spark's
# percentile() and DuckDB's quantile_cont() both sort the exact multiset
# and interpolate identically, so this is hash-exact with no quantization.
# (percentile_approx is the at-scale variant; it is sketch-based and
# engine-specific, so the exact form carries the oracle.)
# --------------------------------------------------------------------------
@query(
    "q44_event_value_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q44_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Histogram binning: width_bucket over [0, 500) in 20 bins per event type.
# DuckDB has no width_bucket — the oracle emulates it with the same
# floor-division arithmetic (identical doubles → identical bins).
# --------------------------------------------------------------------------
@query(
    "q45_value_histogram",
    oracle="""
    SELECT event_type,
           CASE WHEN value < 0.0 THEN 0
                WHEN value >= 500.0 THEN 21
                ELSE CAST(floor(value / 25.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q45_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.select(
            "event_type",
            F.expr("width_bucket(value, 0.0, 500.0, 20)").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part. The reduced schema has no
# partsupp, so unit cost is derived as MIN(l_extendedprice / l_quantity)
# per (part, supplier) — elementwise double division is bit-identical
# across engines, and MIN selects (never recombines) doubles, so the
# correlated "= global min for the part" equality is exact. The per-part
# min is a broadcastable aggregate joined back, not a correlated rescan.
# --------------------------------------------------------------------------
@query(
    "q46_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT p_partkey, s_suppkey, s_name, s_acctbal, unit_cost
    FROM cost
      JOIN best ON cost.l_partkey = best.l_partkey AND cost.unit_cost = best.min_cost
      JOIN part ON p_partkey = cost.l_partkey
      JOIN supplier ON s_suppkey = cost.l_suppkey
    WHERE p_size = 15
    """,
)
def q46_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cost = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        # try_divide: DuckDB division by zero yields NULL (MIN skips it);
        # plain / would abort the Spark job under ANSI on l_quantity = 0
        .agg(F.min(F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))).alias("unit_cost"))
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = t["part"].filter(F.col("p_size") == 15)
    return (
        cost.join(best, on="l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(t["supplier"]), cost.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "unit_cost")
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority checking. Count orders in a quarter that
# have at least one late-shipped lineitem (semi-join EXISTS; the reduced
# schema has no commit/receipt dates, so "late" = shipped >60 days after
# the order date). Both engines compare against the same shifted midnight
# timestamp.
# --------------------------------------------------------------------------
@query(
    "q41_order_priority_checking",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q41_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# --------------------------------------------------------------------------
# TPC-H Q9 shape: product-line profit by nation and year. partsupp's
# supplycost is proxied by p_retailprice * l_quantity * 0.1; the profit
# expression is elementwise double arithmetic quantized by dsum. Part is
# the only filtered dim (LIKE on name) and broadcasts; the l⋈o join
# shuffles on orderkey.
# --------------------------------------------------------------------------
@query(
    "q47_profit_by_nation_year",
    oracle=f"""
    SELECT s_nationkey AS nationkey,
           EXTRACT(year FROM o_orderdate) AS o_year,
           {SUM_D.format('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1')} AS sum_profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q47_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-delay priority split. For lineitems shipped
# >60 days after order date in 1997, count high-priority (1-URGENT/2-HIGH)
# vs lower orders per return flag — the CASE-sum conditional-count idiom.
# --------------------------------------------------------------------------
@query(
    "q48_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def q48_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution. LEFT OUTER join so
# zero-order customers land in the c_count=0 bucket (the filter excludes
# URGENT orders, making the outer side non-vacuous), then a second
# aggregation over the counts — the agg-of-agg histogram idiom.
# --------------------------------------------------------------------------
@query(
    "q49_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q49_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by quarterly revenue — aggregate view +
# scalar-subquery max + equality join back. Revenue goes through the
# decimal grid on both sides, so the max-equality is over identical
# doubles and cannot flake.
# --------------------------------------------------------------------------
@query(
    "q30_top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q30_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m")).first()["m"]
    return (
        revenue.filter(F.col("total_revenue") == F.lit(max_rev))
        .join(F.broadcast(t["supplier"]), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Batch sessionization — the lag/flag/cumsum window idiom (the batch twin
# of st81's streaming session_window). Timestamps are floored to epoch
# seconds (identical in both engines regardless of the parquet NANOS
# physical type) and ordering is (second, event_id), so session boundaries
# are bit-deterministic. The corpus spans 30 days with ~11 h between a
# user's events on average; a 4 h inactivity threshold yields ~6.9k
# sessions at sf0.01 with both merged and split boundaries exercised.
# --------------------------------------------------------------------------
@query(
    "q50_batch_sessionization",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(date_diff('second', TIMESTAMP '1970-01-01', ts) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, sec,
             CASE WHEN sec - lag(sec) OVER w > 14400 OR lag(sec) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    sessions AS (
      SELECT user_id, sec,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(sec) AS start_sec, MAX(sec) AS end_sec,
           MAX(sec) - MIN(sec) AS duration_sec
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def q50_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    sec = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(
        F.col("sec").asc_nulls_last(), "event_id"  # DuckDB null order
    )
    flagged = e.select("user_id", "event_id", sec.alias("sec")).withColumn(
        "is_new",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 14400)
            | F.lag("sec").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("sec").alias("start_sec"),
        F.max("sec").alias("end_sec"),
        (F.max("sec") - F.min("sec")).alias("duration_sec"),
    )


# --------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (the UDAF surface, SURVEY §2.13): exact
# median and IQR per return flag via Arrow-batched numpy. Median/quantile
# are order-statistic SELECTIONS with one midpoint interpolation — exact
# doubles, so the Python-side result hash-matches DuckDB's quantile_cont
# with no decimal grid. (Built-in percentile() covers q44; this query
# pins the pandas_udf GROUPED_AGG code path itself.)
# --------------------------------------------------------------------------
@query(
    "q51_grouped_agg_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25) AS iqr_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q51_grouped_agg_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _qcont(a: "np.ndarray", q: float) -> float:
        # DuckDB quantile_cont arithmetic, verbatim: p = q*(n-1),
        # result = lo*(1-frac) + hi*frac. numpy.percentile's lerp rounds
        # differently in the last ulp, so we interpolate by hand.
        p = q * (len(a) - 1)
        lo = math.floor(p)
        frac = p - lo
        if frac == 0.0:
            return float(a[lo])
        return float(a[lo] * (1 - frac) + a[lo + 1] * frac)

    # explicit GROUPED_AGG eval type: the module-wide `from __future__
    # import annotations` turns hints into strings, breaking inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def median_udaf(v):
        return _qcont(np.sort(v.to_numpy()), 0.5)

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def iqr_udaf(v):
        a = np.sort(v.to_numpy())
        return _qcont(a, 0.75) - _qcont(a, 0.25)

    # Spark disallows mixing pandas UDAFs with JVM aggregates in one agg,
    # so the row count is a pandas UDAF too
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_udaf(v):
        return len(v)

    l = load_tables(spark, sf_dir)["lineitem"]
    return l.groupBy("l_returnflag").agg(
        median_udaf("l_extendedprice").alias("median_price"),
        iqr_udaf("l_extendedprice").alias("iqr_price"),
        count_udaf("l_extendedprice").alias("n"),
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape: revenue impact of small-quantity orders — correlated
# average subquery (qty < 0.2 * that part's avg qty), decorrelated into a
# per-part aggregate joined back. Both engines compute 0.2*avg on the
# decimal grid so the boundary comparison is exact; the final sum is
# decimal-quantized as usual.
# --------------------------------------------------------------------------
@query(
    "q52_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, 0.2 * {AVG_D.format('l_quantity', 'l_quantity')} AS qty_limit
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           {SUM_D.format('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem
      JOIN pa ON pa.l_partkey = lineitem.l_partkey
      JOIN part ON p_partkey = lineitem.l_partkey
    WHERE l_quantity < qty_limit AND p_size <= 5
    GROUP BY p_brand
    """,
)
def q52_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    l = t["lineitem"]
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity")).alias("qty_limit")
    )
    p = t["part"].filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    return (
        l.join(pa, l.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .join(F.broadcast(p), l.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# from_json with a DECLARED schema (vs q22's path-extraction): the parsed
# struct is a real typed column — filterable, groupable, prunable — which
# is the at-scale way to handle JSON payload columns (parse once, not one
# get_json_object tree-walk per path).
# --------------------------------------------------------------------------
@query(
    "q53_from_json_typed",
    oracle="""
    SELECT event_type,
           CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_decile,
           COUNT(*) AS n
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 20
    GROUP BY 1, 2
    """,
)
def q53_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    parsed = e.withColumn("p", F.from_json("props", "struct<k:bigint>"))
    return (
        parsed.filter(F.col("p.k") >= 20)
        .groupBy("event_type", (F.floor(F.col("p.k") / 10)).cast("bigint").alias("k_decile"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# The SQL front door: TPC-H Q6 shape expressed ENTIRELY as spark.sql text
# over registered views — same engine surface a SQL-only user gets. The
# decimal-grid sum expression is literally identical SQL in Spark and
# DuckDB, so the oracle is the same string over the same table names.
# --------------------------------------------------------------------------
_Q54_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM {lineitem}
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
"""


@query("q54_sql_api_forecast_revenue", oracle=_Q54_SQL.format(lineitem="lineitem"))
def q54_sql_api_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)["lineitem"].createOrReplaceTempView("__q54_lineitem")
    return spark.sql(_Q54_SQL.format(lineitem="__q54_lineitem"))


# --------------------------------------------------------------------------
# FULL OUTER join with both-side-only rows: positive-balance customers vs
# big orders. Customers with no big order populate the left-only side;
# big orders whose customer has a non-positive balance populate the
# right-only side — all three match classes are non-empty, which is what
# makes this a real full-outer test rather than an inner join in costume.
# --------------------------------------------------------------------------
@query(
    "q55_full_outer_match_classes",
    oracle="""
    WITH c AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0.0),
    o AS (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 250000.0)
    SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
                WHEN o_orderkey IS NULL THEN 'customer_only'
                ELSE 'matched' END AS match_class,
           COUNT(*) AS n
    FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def q55_full_outer_match_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].filter(F.col("c_acctbal") > 0.0).select("c_custkey")
    o = t["orders"].filter(F.col("o_totalprice") > 250000.0).select("o_custkey", "o_orderkey")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    match_class = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("matched")
    )
    return j.groupBy(match_class.alias("match_class")).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Explicit CROSS JOIN (the one join type the engine should only produce
# when literally asked): the nation × region grid with a membership flag.
# Bounded 25×5 — the plan may broadcast-nested-loop, which is exactly
# right for an intentional cartesian of two tiny dims.
# --------------------------------------------------------------------------
@query(
    "q56_nation_region_grid",
    oracle="""
    SELECT n_nationkey, r_regionkey,
           CAST(n_regionkey = r_regionkey AS BIGINT) AS is_home
    FROM nation CROSS JOIN region
    """,
)
def q56_nation_region_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["nation"].crossJoin(t["region"])
        .select(
            "n_nationkey",
            "r_regionkey",
            (F.col("n_regionkey") == F.col("r_regionkey")).cast("bigint").alias("is_home"),
        )
    )


# --------------------------------------------------------------------------
# Calendar-spine gap filling — the dense time series idiom: generate every
# hour in the observed range (sequence + explode = DuckDB generate_series),
# cross with the event-type dim, left-join the hourly aggregates, zero-
# fill the holes. The spine is tiny (hours × types) and broadcast; the
# event aggregation is the only real shuffle.
# --------------------------------------------------------------------------
@query(
    "q57_dense_hourly_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             COUNT(*) AS n, {SUM_D.format('value')} AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(spine.h, '%Y-%m-%d %H:%M:%S') AS hour,
           types.event_type,
           COALESCE(agg.n, 0) AS n_events,
           COALESCE(agg.total_value, 0.0) AS total_value
    FROM spine CROSS JOIN types
    LEFT JOIN agg ON agg.h = spine.h AND agg.event_type = types.event_type
    """,
)
def q57_dense_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    agg = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    return (
        F.broadcast(spine).crossJoin(F.broadcast(types))
        .join(agg, on=["h", "event_type"], how="left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# Funnel analysis — ordered event-sequence matching (the MATCH_RECOGNIZE
# use case expressed as staged conditional-min joins): per user, the first
# 'view', the first 'click' strictly after it, the first 'purchase'
# strictly after that. Each stage is one equi-join on user_id + a min
# aggregate — at 100 TB the events table shuffles once per stage on a
# uniform key and the per-user frames shrink monotonically down-funnel.
# --------------------------------------------------------------------------
@query(
    "q59_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def q59_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    # Each stage feeds both the next stage and its own count — checkpoint
    # eagerly so the three actions don't recompute upstream stages (six
    # events scans collapse to one per stage).
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .localCheckpoint(eager=True)
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, on="user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return spark.createDataFrame(
        [(v.count(), c.count(), p.count())],
        "n_viewed: long, n_clicked_after_view: long, n_purchased_after_click: long",
    )


# --------------------------------------------------------------------------
# Exact percentiles — PERCENTILE_DISC picks an actual element (the first
# value whose cumulative distribution reaches the fraction), so unlike
# interpolating percentile_cont there is no float arithmetic to diverge
# between engines: the hash-match is exact by construction. At scale
# exact percentiles need a per-group sort of the values; for the
# screening use case percentile_approx (q44) is the 100 TB default and
# this is the exact-auditing variant run on filtered slices.
# --------------------------------------------------------------------------
@query(
    "q60_percentile_disc_prices",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q60_percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p25"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p50"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)").alias("p75"),
    )


def _bucketed_pair_prefix(sf_dir: str) -> str:
    """Stable cross-process name for the bucketed orders/lineitem pair:
    per-sf_dir token + generation fingerprint (same two-token scheme as
    queries/graph._graph_table_prefix, so regenerated testdata can never
    be silently reused and the GC can tell generations apart)."""
    import hashlib
    import os

    sf_tok = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    h = hashlib.md5()
    for t in ("orders", "lineitem"):
        try:
            st = os.stat(f"{sf_dir}/{t}.parquet")
            h.update(f"{t}:{st.st_mtime_ns}:{st.st_size}".encode())
        except OSError:
            pass
    return f"bktj_{sf_tok}_{h.hexdigest()[:8]}"


def _sidecar_backfill(loc: str, buckets: int) -> None:
    """Record the bucket count for a pre-sidecar save (older rounds) so
    every future attach declares what the files actually satisfy — but
    only when the file names CONFIRM it: every bucket id 0..buckets-1
    present on disk means the observed max equals buckets-1. A mere
    can't-refute lower bound (max < buckets-1) is also compatible with a
    save that used FEWER buckets, and stamping the guess would make it
    permanently authoritative, silently mis-routing bucketed joins; such
    saves stay on the per-attach fallback path (which re-checks the
    refutation bound on every attach) or get rebuilt."""
    import os

    from pymongraph_spark.graph.store import max_bucket_id_on_disk

    p = os.path.join(loc, "_BUCKETS")
    if not os.path.exists(p) and max_bucket_id_on_disk(loc) == buckets - 1:
        with open(p, "w") as fh:
            fh.write(str(buckets))


def _ensure_bucketed_pair(spark: SparkSession, sf_dir: str, buckets: int = 16) -> str:
    """Materialize orders+lineitem as co-bucketed tables (bucketBy the
    join key, same bucket count both sides) so orderkey joins run
    shuffle-free: Spark's bucketing makes partition i of each side hold
    exactly the keys with hash%buckets==i, which satisfies the join's
    clustering requirement — no Exchange on either side (pinned in
    test_bucketing.py). At 100 TB this is THE fact-fact join strategy:
    pay one bucketed write, then every orderkey join of every later
    query skips both shuffles. Cross-process lifecycle mirrors the
    derived-graph cache exactly (one shared mechanism,
    store.attach_bucketed_table): a fresh JVM whose in-memory catalog
    has forgotten the tables RE-ATTACHES the surviving files via
    CREATE TABLE ... CLUSTERED BY ... LOCATION instead of
    rmtree-and-rebuilding — so the bucketed write really is paid once
    per generation, and a concurrent reader can never be killed
    mid-scan (VERDICT r5 #1). rmtree only ever touches a location
    without a _SUCCESS marker (interrupted write from a dead JVM);
    stale GENERATIONS are GC'd age-gated with the shared grace
    window."""
    import os

    from pymongraph_spark.graph.store import _warehouse_path, attach_bucketed_table
    from pymongraph_spark.queries.graph import _touch_last_used, drop_stale_generations

    prefix = _bucketed_pair_prefix(sf_dir)
    specs = {
        "orders": ("o_orderkey", ["o_orderkey", "o_orderpriority"]),
        "lineitem": ("l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"]),
    }
    tables = None
    for t, (key, cols) in specs.items():
        name = f"{prefix}_{t}"
        loc = _warehouse_path(spark, name)
        if spark.catalog.tableExists(name):
            _touch_last_used(loc)
            _sidecar_backfill(loc, buckets)
            continue
        if attach_bucketed_table(spark, name, key, buckets_fallback=buckets):
            _touch_last_used(loc)
            _sidecar_backfill(loc, buckets)
            continue
        # No complete files on disk: build. An orphaned partial write
        # (dead JVM mid-write — no _SUCCESS, so no reader can be on it)
        # would make saveAsTable raise LOCATION_ALREADY_EXISTS; clear it.
        import shutil

        shutil.rmtree(loc, ignore_errors=True)
        if tables is None:
            tables = load_tables(spark, sf_dir)
        tables[t].select(cols).write.bucketBy(buckets, key).sortBy(key).mode(
            "overwrite"
        ).format("parquet").saveAsTable(name)
        # _BUCKETS sidecar: the count a later process's re-attach MUST
        # declare (mismatch = silently wrong bucketed joins)
        with open(os.path.join(loc, "_BUCKETS"), "w") as fh:
            fh.write(str(buckets))
        _touch_last_used(loc)
    # age-gated GC of other GENERATIONS of this sf_dir's pair (shared
    # policy with the derived-graph caches — one implementation)
    sf_tok, gen = prefix.split("_")[1], prefix.split("_")[2]

    def parse(d: str):
        p = d.split("_")
        if len(p) >= 4 and p[0] == "bktj":
            return p[1], p[2]
        return None

    drop_stale_generations(spark, sf_tok, gen, parse)
    return prefix


def bucketed_orderkey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located join itself (separate from the q61 aggregate so the
    plan test can assert exchange-freedom on exactly this frame)."""
    prefix = _ensure_bucketed_pair(spark, sf_dir)
    o = spark.table(f"{prefix}_orders")
    li = spark.table(f"{prefix}_lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey)


@query(
    "q61_bucketed_colocated_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q61_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over the CO-BUCKETED orders⋈lineitem
    pair: results are identical to the plain join (the oracle is the
    plain join), but the physical plan has no Exchange under the
    SortMergeJoin — the bucketed layout satisfies the join clustering on
    both sides. The one shuffle left is the tiny 5-row priority agg."""
    return (
        bucketed_orderkey_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "q62_partitioned_sink_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type IN ('view', 'click')
    GROUP BY event_type
    """,
)
def q62_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink: events written
    ``partitionBy(event_type)`` with DYNAMIC partition overwrite (only
    the partitions present in the incoming frame are replaced — the
    idempotent daily-reload semantics; static mode would truncate the
    whole table), then read back with a partition-column filter that
    prunes to 2 of the directories at FILE LISTING time — the scan never
    opens the other partitions' files (pinned in test_plans.py). The
    roundtrip is written twice to prove overwrite idempotency under the
    oracle: a duplicating reload would double every count."""
    import os

    events = load_tables(spark, sf_dir)["events"]
    out = scratch_dir("q62_part_sink", sf_dir)
    with _dynamic_partition_overwrite(spark):
        for _ in range(2):  # idempotent reload: same partitions replaced
            events.write.mode("overwrite").partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).filter(F.col("event_type").isin("view", "click"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def _dynamic_partition_overwrite(spark: SparkSession):
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        key = "spark.sql.sources.partitionOverwriteMode"
        old = spark.conf.get(key, "STATIC")
        spark.conf.set(key, "dynamic")
        try:
            yield
        finally:
            spark.conf.set(key, old)

    return cm()


@query(
    "q63_time_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_win
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q63_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame — the sliding-interval aggregate
    rows-frames can't express (a rows frame counts rows, not seconds):
    per user, events in the trailing 10 minutes INCLUDING same-timestamp
    ties (range frames close over ties identically in both engines,
    which is why the frame is ordered on epoch MICROseconds — whole
    seconds would floor away sub-second precision and the two engines'
    frames would drift at the boundaries). One shuffle on user_id; the
    frame scan is linear per partition. Decimal-grid sum keeps the
    double bit-stable."""
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts").asc_nulls_last())  # DuckDB null order
        .rangeBetween(-600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_win"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("sum_win"),
    )


@query(
    "q64_unpivot_measures",
    oracle=f"""
    WITH long AS (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    )
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           {SUM_D.format('value')} AS total
    FROM long GROUP BY measure
    """,
)
def q64_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via the native UNPIVOT (DataFrame.unpivot,
    Spark 3.4+): three measure columns melt into (measure, value) rows,
    then a per-measure rollup. At scale unpivot is a map-only stage —
    each input row emits its measures locally, no shuffle until the
    aggregate (which is partial). The oracle is the explicit UNION-ALL
    long form, the semantics unpivot guarantees."""
    li = load_tables(spark, sf_dir)["lineitem"]
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("value").alias("total"),
    )


@query(
    "q65_ewma_user_values",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             list_sort(list(struct_pack(ts := ts, eid := event_id, v := value))) AS evs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(evs) AS BIGINT) AS n_events,
           list_reduce(list_transform(evs, p -> p.v),
                       (acc, v) -> acc * 0.7 + v * 0.3) AS ewma
    FROM ordered
    """,
)
def q65_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (alpha = 0.3, seeded at the first event — list_reduce starts the
    fold from element 1, so both engines share the same recurrence and
    the double chain is bit-exact because both fold left in event-time
    order, ties broken by event id). The inherently-sequential
    recurrence runs as ONE ordered fold per user over a sorted
    collect_list — state is per-user, the shuffle is the single
    groupBy(user_id), and at 100 TB per-user event lists are the same
    bounded-state assumption the sessionization and streaming-state
    operators already make."""
    e = load_tables(spark, sf_dir)["events"]
    ordered = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id").alias("eid"), F.col("value").alias("v")))
        ).alias("evs")
    )
    vals = F.transform("evs", lambda p: p["v"])
    return ordered.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.aggregate(
            F.slice(vals, 2, F.greatest(F.size("evs") - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, v: acc * 0.7 + v * 0.3,
        ).alias("ewma"),
    )


_Q66_SQL = """
SELECT r.r_name AS region, t.n_name AS nation, CAST(t.n_customers AS BIGINT) AS n_customers
FROM region r,
LATERAL (
  SELECT n.n_name, COUNT(*) AS n_customers
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_customers DESC, n.n_name
  LIMIT 2
) t
"""


@query("q66_lateral_top_nations", oracle=_Q66_SQL)
def q66_lateral_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the per-outer-row derived table the
    SQL front door must support (Spark 4 LATERAL, same text DuckDB
    runs): for each region, the top-2 nations by customer count, ties
    broken by name. Catalyst decorrelates the lateral into a
    window/top-k plan, so the at-scale execution matches the q10
    row_number formulation — the LATERAL form is the API surface, not a
    different engine path."""
    t = load_tables(spark, sf_dir)
    for name in ("region", "nation", "customer"):
        t[name].createOrReplaceTempView(name)
    return spark.sql(_Q66_SQL)


# --------------------------------------------------------------------------
# PIVOT reshaping (q64's unpivot inverse): revenue by return flag with one
# column per line status. Explicit pivot VALUES list — without it Spark
# first runs a distinct scan to discover the columns, an extra job and a
# nondeterministic column order; at 100 TB the value list is always known
# (or sampled) ahead of time. Decimal sums, exact across engines.
# --------------------------------------------------------------------------
@query(
    "q67_pivot_revenue_by_status",
    oracle="""
    SELECT l_returnflag,
           SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) END)
             AS status_f_revenue,
           SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4)) END)
             AS status_o_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q67_pivot_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,4)")
    pivoted = (
        li.select("l_returnflag", "l_linestatus", rev.alias("rev"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("rev"))
        .withColumnRenamed("F", "status_f_revenue")
        .withColumnRenamed("O", "status_o_revenue")
    )
    counts = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_items"))
    return pivoted.join(counts, on="l_returnflag")


# --------------------------------------------------------------------------
# TPC-H Q21 shape: doubly-correlated EXISTS / NOT EXISTS — suppliers who
# were the ONLY late shipper in a multi-supplier order. One SQL template
# serves both engines (only table names differ), so what's under test is
# Catalyst's decorrelation: EXISTS → left-semi, NOT EXISTS → left-anti,
# both equi-joins on l_orderkey (never per-row subquery execution — the
# reference's N+1 pattern is exactly what this plan shape retires).
# --------------------------------------------------------------------------
_Q68_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM {supplier} s JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
  JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  AND EXISTS (SELECT 1 FROM {lineitem} l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {lineitem} l3 JOIN {orders} o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@query(
    "q68_exclusive_late_supplier",
    oracle=_Q68_SQL.format(supplier="supplier", lineitem="lineitem", orders="orders"),
)
def q68_exclusive_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    t["supplier"].createOrReplaceTempView("__q68_supplier")
    t["lineitem"].createOrReplaceTempView("__q68_lineitem")
    t["orders"].createOrReplaceTempView("__q68_orders")
    return spark.sql(
        _Q68_SQL.format(
            supplier="__q68_supplier", lineitem="__q68_lineitem", orders="__q68_orders"
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape: nested IN subqueries with an aggregate-vs-scalar
# threshold — suppliers who shipped a "hot" part (per-part total quantity
# within 5% of the corpus max). All-integer-valued arithmetic
# (qty*20 > max*19: cross-multiplication instead of a division) so the
# cutoff is bit-exact in both engines. DataFrame form here (q68 covers
# the SQL front door): the scalar max broadcasts via a 1-row cross join,
# the hot-part list drives two cascaded left-semi joins — part list and
# supplier-key list are both dimension-sized, never a fact shuffle.
# --------------------------------------------------------------------------
@query(
    "q69_hot_part_suppliers",
    oracle="""
    WITH part_qty AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem WHERE l_partkey IN (
        SELECT l_partkey FROM part_qty
        WHERE qty * 20 > (SELECT MAX(qty) FROM part_qty) * 19
      )
    )
    ORDER BY s_name
    """,
)
def q69_hot_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li, supp = t["lineitem"], t["supplier"]
    # dsum: the 95%-of-max cutoff is only engine-stable if the per-part
    # sums are order-free (l_quantity is DOUBLE in the parquet)
    part_qty = li.groupBy("l_partkey").agg(dsum("l_quantity").alias("qty"))
    maxq = part_qty.agg(F.max("qty").alias("maxq"))
    hot = (
        part_qty.crossJoin(F.broadcast(maxq))
        .filter(F.col("qty") * 20 > F.col("maxq") * 19)
        .select("l_partkey")
    )
    supp_keys = li.join(F.broadcast(hot), on="l_partkey", how="left_semi").select(
        "l_suppkey"
    )
    return (
        supp.join(
            supp_keys.withColumnRenamed("l_suppkey", "s_suppkey").distinct(),
            on="s_suppkey",
            how="left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Spark 4 VARIANT: the semi-structured column type (open-format binary
# JSON, typed-path access without a declared schema). Distinct from q22
# (string get_json_object) and q53 (from_json to a declared struct):
# parse_json materializes a VARIANT value and try_variant_get does typed
# path extraction — schema-on-read that still runs JVM-side. At 100 TB
# VARIANT beats JSON strings: parsed once at ingest, shredded storage,
# no per-query re-parse. Oracle: DuckDB JSON path extraction.
# --------------------------------------------------------------------------
@query(
    "q70_variant_typed_paths",
    oracle="""
    SELECT event_type,
           CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS BIGINT) AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE json_extract_string(props, '$.missing') IS NULL
    GROUP BY 1, 2
    """,
)
def q70_variant_typed_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    v = e.withColumn("v", F.parse_json("props"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.filter(F.try_variant_get("v", "$.missing", "string").isNull())
        .groupBy("event_type", (k % 7).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(k).alias("sum_k"))
    )


# --------------------------------------------------------------------------
# LOCF gap-fill (last observation carried forward): only 'purchase'
# events carry a meaningful price; every event sees the user's most
# recent purchase value. last_value(... IGNORE NULLS) over a running
# frame — pure selection (no arithmetic), so doubles pass through
# bit-exact. One shuffle on user_id; micro-second ordering keys.
# --------------------------------------------------------------------------
@query(
    "q71_locf_last_purchase",
    oracle="""
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_value
    FROM events
    """,
)
def q71_locf_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts").asc_nulls_last(), "event_id")  # DuckDB null order
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(purchase_val, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# --------------------------------------------------------------------------
# Spark 4 Python Data Source API roundtrip: documents land as JSONL (plus
# a hand-planted corrupt file), then come back through the custom
# ``jsonl_reports`` source (ingest/pyds.py) — dead-letter semantics under
# the hash gate: corrupt lines become NULL-typed rows with the raw line
# preserved, valid rows parse exactly, nothing is dropped. One input
# partition per file gives N-way parallel reads.
# --------------------------------------------------------------------------
@query(
    "q72_python_datasource_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM documents GROUP BY lang
    UNION ALL
    SELECT NULL, 2, NULL, 2
    """,
)
def q72_python_datasource_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pymongraph_spark.ingest.pyds import register_jsonl_reports

    docs = load_tables(spark, sf_dir)["documents"]
    out = scratch_dir("q72_jsonl", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    docs.select("doc_id", "lang", "n_chars").repartition(4).write.mode(
        "overwrite"
    ).json(out)
    with open(os.path.join(out, "zz-corrupt.jsonl"), "w") as fh:
        fh.write('{"doc_id": "not-a-number"}\nthis is not json at all\n')

    register_jsonl_reports(spark)
    back = spark.read.format("jsonl_reports").option("path", out).load()
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count("_corrupt").cast("bigint").alias("n_corrupt"),
    )


# --------------------------------------------------------------------------
# The full ranking-function family in one pass: row_number / ntile over a
# TOTAL order (unique tiebreak — both are nondeterministic under ties),
# rank / dense_rank / percent_rank / cume_dist over a COARSE key with
# real ties (where they differ from row_number and from each other).
# Both windows share one partition key → one exchange. percent_rank and
# cume_dist are single divisions of identical integers in both engines.
# --------------------------------------------------------------------------
@query(
    "q73_rank_family",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           ROW_NUMBER() OVER total_w AS rn,
           CAST(NTILE(4) OVER total_w AS INT) AS quartile,
           RANK() OVER band_w AS rnk,
           DENSE_RANK() OVER band_w AS drnk,
           PERCENT_RANK() OVER band_w AS prnk,
           CUME_DIST() OVER band_w AS cdist
    FROM customer
    WINDOW total_w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           band_w AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC)
    """,
)
def q73_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    band = F.floor(F.col("c_acctbal") / 1000)
    total_w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    band_w = Window.partitionBy("c_mktsegment").orderBy(F.desc(band))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        band.cast("bigint").alias("bal_band"),
        F.row_number().over(total_w).alias("rn"),
        F.ntile(4).over(total_w).alias("quartile"),
        F.rank().over(band_w).alias("rnk"),
        F.dense_rank().over(band_w).alias("drnk"),
        F.percent_rank().over(band_w).alias("prnk"),
        F.cume_dist().over(band_w).alias("cdist"),
    )


# --------------------------------------------------------------------------
# Multiset set operations: INTERSECT ALL / EXCEPT ALL keep duplicate
# multiplicities (q15 covers the DISTINCT variants — a different physical
# operator: these plan as aggregated count-compare unions, not hash
# semi/anti). Multiplicity math: min(m,n) for intersect-all,
# max(m-n, 0) for except-all — pinned by the count-per-segment output.
# --------------------------------------------------------------------------
@query(
    "q74_multiset_set_ops",
    oracle="""
    WITH a AS (SELECT c_mktsegment FROM customer WHERE c_acctbal > 0),
         b AS (SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000)
    SELECT 'intersect_all' AS op, c_mktsegment, COUNT(*) AS n
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
    UNION ALL
    SELECT 'except_all', c_mktsegment, COUNT(*)
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
    """,
)
def q74_multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    a = c.filter(F.col("c_acctbal") > 0).select("c_mktsegment")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    i = (
        a.intersectAll(b)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "c_mktsegment", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "c_mktsegment", "n")
    )
    return i.unionByName(e)


# --------------------------------------------------------------------------
# Generator functions: collect_list → posexplode_outer round-trip. The
# OUTER variant preserves parents with empty/null arrays as one
# null-position row — orders whose lineitems were all filtered away stay
# visible (the left-join-shaped lateral view). Ordering rides INSIDE the
# array (sort_array over structs) so the positions are deterministic
# under any partitioning.
# --------------------------------------------------------------------------
@query(
    "q75_posexplode_outer_roundtrip",
    oracle="""
    WITH items AS (
      SELECT l_orderkey,
             list({'ln': l_linenumber, 'q': l_quantity}
                  ORDER BY l_linenumber, l_quantity) AS arr
      FROM lineitem WHERE l_quantity >= 45
      GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey, items.arr FROM orders o
      LEFT JOIN items ON items.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey < 2000
    )
    SELECT o_orderkey, u.u.pos AS pos, u.u.item.ln AS linenumber,
           u.u.item.q AS quantity
    FROM joined, LATERAL UNNEST(
      CASE WHEN arr IS NULL OR len(arr) = 0
           THEN [{'pos': CAST(NULL AS INT),
                  'item': CAST(NULL AS STRUCT(ln BIGINT, q DOUBLE))}]
           ELSE [{'pos': CAST(i - 1 AS INT), 'item': arr[i]}
                 for i in generate_series(1, len(arr))] END) AS u(u)
    """,
)
def q75_posexplode_outer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    items = (
        t["lineitem"]
        .filter(F.col("l_quantity") >= 45)
        .groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("l_linenumber").alias("ln"),
                                        F.col("l_quantity").alias("q")))
            ).alias("arr")
        )
    )
    joined = (
        t["orders"]
        .filter(F.col("o_orderkey") < 2000)
        .join(items, items["l_orderkey"] == F.col("o_orderkey"), "left")
        .select("o_orderkey", "arr")
    )
    return joined.select(
        "o_orderkey", F.posexplode_outer("arr").alias("pos", "item")
    ).select(
        "o_orderkey",
        "pos",
        F.col("item.ln").alias("linenumber"),
        F.col("item.q").alias("quantity"),
    )


# --------------------------------------------------------------------------
# Engine-neutral HyperLogLog — the approx-distinct sketch you can VERIFY:
# q29's approx_count_distinct is rows-only because Spark's HLL++ isn't
# reproducible in SQL; this one is built from first principles on the
# md5 hash (56-bit value: low 4 bits pick one of m=16 registers, the
# register keeps the max leading-zero rank rho of the remaining 52 bits
# — rho via 53 - len(bin(w)): both engines print binary without leading
# zeros, no transcendental log). The harmonic estimate folds registers
# IN BUCKET ORDER (dyadic 2^-rho terms can round differently per order
# once they mix with the 1.0 missing-register terms, so both engines run
# the identical sequence), then one constant division: alpha16*m^2 / S.
# Exact distinct and relative error ride along — the sketch's accuracy
# is itself under the hash gate.
# --------------------------------------------------------------------------
_Q76_ALPHA_MM = 0.673 * 16 * 16  # alpha_16 * m^2, plan constant


@query(
    "q76_hll_neutral",
    oracle=f"""
    WITH h AS (
      SELECT o_orderpriority AS grp, o_custkey,
             list_reduce([CAST(strpos('0123456789abcdef',
                               substr(md5(CAST(o_custkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                          for i in generate_series(1, 14)],
                         (acc, x) -> acc * 16 + x) AS hv
      FROM orders
    ),
    reg AS (
      SELECT grp, hv % 16 AS bucket,
             MAX(CASE WHEN hv // 16 = 0 THEN 53
                      ELSE 53 - len(bin(hv // 16)) END) AS rho
      FROM h GROUP BY grp, hv % 16
    ),
    est AS (
      SELECT grp,
             {_Q76_ALPHA_MM} / (
               list_reduce(list_prepend(0.0,
                 list(1.0 / (CAST(1 AS BIGINT) << rho) ORDER BY bucket)),
                 (a, b) -> a + b)
               + (16 - COUNT(*)) * 1.0
             ) AS hll_estimate
      FROM reg GROUP BY grp
    ),
    ex AS (
      SELECT o_orderpriority AS grp, COUNT(DISTINCT o_custkey) AS n_exact
      FROM orders GROUP BY grp
    )
    SELECT ex.grp AS o_orderpriority, ex.n_exact, est.hll_estimate,
           abs(est.hll_estimate - ex.n_exact) / ex.n_exact AS rel_err
    FROM ex JOIN est ON ex.grp = est.grp
    """,
)
def q76_hll_neutral(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"]
    hv = F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 14), 16, 10).cast(
        "long"
    )
    # hv // 16 EXACTLY: hv is a 56-bit value, and double division is only
    # exact to 2^53, so (hv/16).cast(long) could truncate differently from
    # the oracle's integer quotient near 16*2^k boundaries (ADVICE r5 #3) —
    # shiftright is the bit-identical integer form
    w = F.shiftright(F.col("hv"), 4)
    rho = F.when(w == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(w)))
    reg = (
        o.select(F.col("o_orderpriority").alias("grp"), hv.alias("hv"))
        .select("grp", (F.col("hv") % 16).alias("bucket"),
                rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    # ordered fold over (bucket, rho) structs — identical sequence to the
    # oracle's ORDER BY bucket list fold
    inv = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(rho AS INT))").cast(
        "double"
    )
    est = reg.withColumn("inv", inv).groupBy("grp").agg(
        (
            F.lit(_Q76_ALPHA_MM)
            / (
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("bucket", "inv"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["inv"],
                )
                + (F.lit(16) - F.count(F.lit(1))).cast("double")
            )
        ).alias("hll_estimate")
    )
    ex = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    return (
        ex.join(est, on="grp")
        .select(
            F.col("grp").alias("o_orderpriority"),
            "n_exact",
            "hll_estimate",
            (F.abs(F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact")).alias(
                "rel_err"
            ),
        )
    )


# --------------------------------------------------------------------------
# Built-in session_window in BATCH mode (q50 hand-rolls the same
# semantics with lag+cumsum — this is the one-call form, and the same
# operator Structured Streaming uses for st81). Boundary semantics are
# session_window's: an event exactly `gap` after the previous one starts
# a NEW session (merge condition is strict <), so the oracle's is_new
# flag uses >=. Window end = last event + gap by definition.
# --------------------------------------------------------------------------
@query(
    "q77_session_window_builtin",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - lag(us) OVER w >= 14400000000
                       OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
      SELECT user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(us) AS session_start_us,
           MAX(us) + 14400000000 AS session_end_us,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q77_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    return (
        e.groupBy("user_id", F.session_window("ts", "4 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Bloom-filter runtime filter, engine-neutral and ACCOUNTED: build a
# 1024-bit / 3-hash bloom over the hot-order keys (32 words via bit_or
# aggregation; 32 bits per word keeps shifts inside DuckDB's checked range), probe every lineitem through it, and report hits
# vs exact membership — the false-positive rate of the filter is itself
# under the hash gate. This is the shape of Spark's own runtime row
# filters (and of join pushdown filters generally): the bitmap is tiny
# and broadcasts; the big side is filtered BEFORE the real join. md5
# substrings give the 3 positions, so DuckDB reproduces every bit.
# --------------------------------------------------------------------------
@query(
    "q78_bloom_filter_accounting",
    oracle="""
    WITH hot AS (
      SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
    ),
    pos AS (
      SELECT o_orderkey AS k, unnest([
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(1, 7)], (a, x) -> a * 16 + x) % 1024,
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(8, 14)], (a, x) -> a * 16 + x) % 1024,
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(15, 21)], (a, x) -> a * 16 + x) % 1024
      ]) AS p FROM hot
    ),
    bitmap AS (
      SELECT p // 32 AS word, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
      FROM pos GROUP BY p // 32
    ),
    probe AS (
      SELECT pk AS k, unnest([
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(pk AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(1, 7)], (a, x) -> a * 16 + x) % 1024,
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(pk AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(8, 14)], (a, x) -> a * 16 + x) % 1024,
        list_reduce([CAST(strpos('0123456789abcdef', substr(md5(CAST(pk AS VARCHAR)), i, 1)) - 1 AS BIGINT)
                     for i in generate_series(15, 21)], (a, x) -> a * 16 + x) % 1024
      ]) AS p
      FROM (SELECT DISTINCT l_orderkey AS pk FROM lineitem)
    ),
    verdicts AS (
      SELECT probe.k,
             MIN(CASE WHEN bitmap.bits IS NULL THEN 0
                      ELSE (bitmap.bits >> CAST(probe.p % 32 AS INT)) & 1 END) AS hit
      FROM probe LEFT JOIN bitmap ON bitmap.word = probe.p // 32
      GROUP BY probe.k
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN hot.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_members,
           CAST(SUM(hit) - SUM(CASE WHEN hot.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives
    FROM verdicts LEFT JOIN hot ON verdicts.k = hot.o_orderkey
    """,
)
def q78_bloom_filter_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def positions(key_col):
        hexd = F.md5(F.col(key_col).cast("string"))
        return F.array(
            F.conv(F.substring(hexd, 1, 7), 16, 10).cast("long") % 1024,
            F.conv(F.substring(hexd, 8, 7), 16, 10).cast("long") % 1024,
            F.conv(F.substring(hexd, 15, 7), 16, 10).cast("long") % 1024,
        )

    hot = t["orders"].filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    pos = hot.select(F.explode(positions("o_orderkey")).alias("p"))
    bitmap = pos.groupBy((F.col("p") / 32).cast("long").alias("word")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))").alias("bits")
    )
    probe = (
        t["lineitem"].select("l_orderkey").distinct()
        .select(F.col("l_orderkey").alias("k"), F.explode(positions("l_orderkey")).alias("p"))
        .withColumn("word", (F.col("p") / 32).cast("long"))
    )
    hit_bit = F.expr(
        "CASE WHEN bits IS NULL THEN 0 "
        "ELSE shiftright(bits, CAST(p % 32 AS INT)) & 1 END"
    )
    verdicts = (
        probe.join(F.broadcast(bitmap), on="word", how="left")
        .select("k", hit_bit.alias("hb"))
        .groupBy("k")
        .agg(F.min("hb").alias("hit"))
    )
    out = verdicts.join(
        hot.withColumnRenamed("o_orderkey", "k").withColumn("__m", F.lit(1)),
        on="k",
        how="left",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("hit").cast("bigint").alias("n_bloom_hits"),
        F.sum(F.coalesce("__m", F.lit(0))).cast("bigint").alias("n_true_members"),
        (F.sum("hit") - F.sum(F.coalesce("__m", F.lit(0))))
        .cast("bigint")
        .alias("n_false_positives"),
    )


# --------------------------------------------------------------------------
# Schema evolution across landed batches: an early batch lacks a column
# a later batch carries (the normal state of a long-lived 100 TB corpus).
# mergeSchema=true unions the file schemas at read time; rows from the
# old batch surface NULL for the new column — the aggregate proves both
# directions (counts see every row, the new column only its batch).
# Written twice as overwrite (idempotent rebuild), then one read.
# --------------------------------------------------------------------------
@query(
    "q79_schema_evolution_read",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_with_chars,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT) AS chars_new_batch
    FROM documents
    GROUP BY lang
    """,
)
def q79_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    docs = load_tables(spark, sf_dir)["documents"]
    out = scratch_dir("q79_evo", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    # batch 1: the OLD schema (no n_chars); batch 2 adds the column
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "append"
    ).parquet(out)
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
        "append"
    ).parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").cast("bigint").alias("n_with_chars"),
        F.sum("n_chars").cast("bigint").alias("chars_new_batch"),
    )


# --------------------------------------------------------------------------
# Salted aggregation UNDER THE GATE: the skew-mitigation two-phase
# aggregate (operators/skew.py — random salt → partial sum/count per
# (key, salt) → final merge) must be bit-identical to the plain
# aggregate, whatever the salt assignment did to partition placement.
# Decimal-grid accumulation is what makes that claim exact rather than
# approximate; the oracle is the UNSALTED formulation.
# --------------------------------------------------------------------------
@query(
    "q80_salted_agg_equivalence",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           COUNT(*) AS count_value
    FROM events GROUP BY user_id
    """,
)
def q80_salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.skew import salted_sum_count

    e = load_tables(spark, sf_dir)["events"]
    return salted_sum_count(e, ["user_id"], "value", salt_buckets=16)


# --------------------------------------------------------------------------
# Built-in PERMISSIVE corrupt-record capture (the spark.read.json native
# dead-letter, complementing the custom Python source's q72): malformed
# lines land in _corrupt_record with every typed field NULL; valid rows
# parse. mode=PERMISSIVE is the default but is set explicitly — FAILFAST
# would kill the 100 TB job on one bad byte, DROPMALFORMED silently
# loses data; PERMISSIVE + accounting is the production policy.
# --------------------------------------------------------------------------
@query(
    "q81_permissive_json_read",
    oracle="""
    SELECT lang, COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM documents GROUP BY lang
    UNION ALL
    SELECT NULL, 3, NULL, 3
    """,
)
def q81_permissive_json_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from pyspark.sql import types as T

    docs = load_tables(spark, sf_dir)["documents"]
    out = scratch_dir("q81_json", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    docs.select("doc_id", "lang", "n_chars").write.json(out)
    with open(os.path.join(out, "zz-bad.json"), "w") as fh:
        fh.write('{"doc_id": 1, "lang": "en", "n_chars":\nnot json\n{"truncated": \n')

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count("_corrupt_record").cast("bigint").alias("n_corrupt"),
    )


# --------------------------------------------------------------------------
# Map column functions: map_from_entries → map_filter → transform_values
# → back out as a canonical string (map cell FORMATTING differs between
# engines, so the map column does the work mid-pipeline and the output
# is its sorted entry list). Per user: event_type→count map, filtered to
# types seen >= 5 times, values doubled by transform_values.
# --------------------------------------------------------------------------
@query(
    "q82_map_functions",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           array_to_string(
             list(event_type || ':' || CAST(c * 2 AS VARCHAR) ORDER BY event_type),
             ',') AS hot_types
    FROM counts
    WHERE c >= 5
    GROUP BY user_id
    """,
)
def q82_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    hot = m.select(
        "user_id",
        F.transform_values(
            F.map_filter("m", lambda k, v: v >= 5), lambda k, v: v * 2
        ).alias("hot"),
    ).filter(F.size(F.map_keys("hot")) > 0)
    # sort the ENTRY STRUCTS (by key, the oracle's ORDER BY event_type),
    # then render — sorting the rendered "key:count" strings would order
    # by the ':' byte wherever one key is a prefix of another
    entry_strs = F.transform(
        F.sort_array(F.map_entries("hot")),
        lambda kv: F.concat_ws(":", kv["key"], kv["value"].cast("string")),
    )
    return hot.select(
        "user_id", F.array_join(entry_strs, ",").alias("hot_types")
    )


# --------------------------------------------------------------------------
# ANSI-safe arithmetic: try_cast / try_divide / try_add return NULL
# instead of raising — the error policy that keeps a 100 TB job alive on
# dirty cells without silently corrupting values (NULLs are countable;
# wrapped overflows are not). Cells are manufactured from props so every
# failure mode is present: unparsable string, division by zero, bigint
# overflow.
# --------------------------------------------------------------------------
@query(
    "q83_try_arithmetic",
    oracle="""
    WITH cells AS (
      SELECT event_id,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing
      FROM events
    )
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(k) AS BIGINT) AS n_parsed,
           CAST(COUNT(missing) AS BIGINT) AS n_missing_parsed,
           CAST(SUM(CASE WHEN k % 10 = 0 THEN NULL ELSE k // (k % 10) END) AS BIGINT)
             AS sum_safe_div,
           CAST(COUNT(CASE WHEN k % 10 = 0 THEN 1 END) AS BIGINT) AS n_div_nulls
    FROM cells
    """,
)
def q83_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    # try_cast, not try_to_number with a fixed-width format: the oracle's
    # TRY_CAST accepts negatives and any digit width, and a '999999'
    # format would silently NULL wider/signed values the oracle parses
    # (ADVICE r5 #4)
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    missing = F.get_json_object("props", "$.missing").try_cast("bigint")
    cells = e.select("event_id", k.alias("k"), missing.alias("missing"))
    safe_div = F.floor(F.try_divide(F.col("k"), F.col("k") % 10)).cast("bigint")
    return cells.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("k").cast("bigint").alias("n_parsed"),
        F.count("missing").cast("bigint").alias("n_missing_parsed"),
        F.sum(safe_div).cast("bigint").alias("sum_safe_div"),
        F.count(F.when(F.col("k") % 10 == 0, 1)).cast("bigint").alias("n_div_nulls"),
    )


# --------------------------------------------------------------------------
# Accuracy-contract oracle for percentile_approx: the sketch value
# itself is engine-specific, so what the gate pins is the CONTRACT —
# with accuracy N the approximate rank error is bounded by 1/N, and at
# 10000 on this data every group's approx median must land within the
# exact p45..p55 band. The query outputs the exact median and the
# boolean; if Spark's sketch ever drifts outside the band, the constant
# TRUE stops matching. (Evaluation-genre oracle, like s60 and d55.)
# --------------------------------------------------------------------------
@query(
    "q84_percentile_approx_contract",
    oracle="""
    SELECT l_returnflag,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS exact_median,
           TRUE AS within_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q84_percentile_approx_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias(
            "exact_median"
        ),
        (
            (
                F.percentile_approx("l_extendedprice", 0.5, 10000)
                >= F.expr("percentile_disc(0.45) WITHIN GROUP (ORDER BY l_extendedprice)")
            )
            & (
                F.percentile_approx("l_extendedprice", 0.5, 10000)
                <= F.expr("percentile_disc(0.55) WITHIN GROUP (ORDER BY l_extendedprice)")
            )
        ).alias("within_band"),
    )


# --------------------------------------------------------------------------
# Explicit NULL-ordering semantics: the engines DISAGREE by default
# (Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST), so any query
# whose ranking can see a NULL must pin the placement explicitly — this
# one does, in both directions, over a column that is genuinely null
# (no purchase yet → null last_value). Deterministic total order via
# the event_id tiebreak.
# --------------------------------------------------------------------------
@query(
    "q85_null_ordering_pinned",
    oracle="""
    WITH lv AS (
      SELECT event_id, user_id,
             last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                     ROWS UNBOUNDED PRECEDING) AS lpv
      FROM events
    )
    SELECT event_id, lpv,
           ROW_NUMBER() OVER (ORDER BY lpv ASC NULLS FIRST, event_id) AS rn_nulls_first,
           ROW_NUMBER() OVER (ORDER BY lpv DESC NULLS LAST, event_id) AS rn_nulls_last
    FROM lv
    WHERE event_id < 500
    """,
)
def q85_null_ordering_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lpv = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    lv = e.select("event_id", "user_id", lpv.alias("lpv")).filter(F.col("event_id") < 500)
    return lv.select(
        "event_id",
        "lpv",
        F.row_number()
        .over(Window.orderBy(F.col("lpv").asc_nulls_first(), "event_id"))
        .alias("rn_nulls_first"),
        F.row_number()
        .over(Window.orderBy(F.col("lpv").desc_nulls_last(), "event_id"))
        .alias("rn_nulls_last"),
    )


# --------------------------------------------------------------------------
# Spark 4 COLLATIONS: case-insensitive grouping via a collated column
# (UTF8_LCASE) instead of a lower() projection — the collation travels
# with the type, so every downstream comparison/join/group inherits it.
# Case variance is manufactured deterministically (initcap on even
# custkeys); output canonicalizes through binary min so the collated
# group's representative is stable. Oracle: GROUP BY lower().
# --------------------------------------------------------------------------
@query(
    "q86_collated_grouping",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN c_custkey % 2 = 0
                  THEN upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
                  ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT lower(seg) AS segment, COUNT(*) AS n, MIN(seg) AS canon
    FROM s GROUP BY lower(seg)
    """,
)
def q86_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir)["customer"]
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.initcap(F.lower("c_mktsegment"))
    ).otherwise(F.col("c_mktsegment"))
    s = c.select(seg.alias("seg"))
    return (
        s.groupBy(F.collate("seg", "UTF8_LCASE").alias("cseg"))
        .agg(F.count(F.lit(1)).alias("n"), F.min(F.collate("seg", "UTF8_BINARY")).alias("canon"))
        .select(F.lower("cseg").cast("string").alias("segment"), "n", "canon")
    )


# --------------------------------------------------------------------------
# Cohort retention matrix — the product-analytics staple: users are
# cohorted by their first active day; retention at day-offset k is the
# distinct-user count active exactly k days later. Scale shape: two
# shuffles on user_id (first-day agg + user-day distinct), one equi-join
# on that uniform key, then a (cohort_date, offset) partial agg; the
# cohort-size frame is calendar-bounded (≤ days in range) and broadcast.
# Nothing is corpus × corpus and no window sort is involved.
# --------------------------------------------------------------------------
@query(
    "q87_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    ),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    r AS (
      SELECT f.cohort_date,
             datediff('day', f.cohort_date, a.d) AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM a JOIN f USING (user_id)
      WHERE datediff('day', f.cohort_date, a.d) <= 7
      GROUP BY 1, 2
    ),
    c AS (SELECT cohort_date, COUNT(*) AS n_cohort FROM f GROUP BY 1)
    SELECT strftime(r.cohort_date, '%Y-%m-%d') AS cohort_date,
           CAST(r.day_offset AS INT) AS day_offset,
           r.n_active,
           c.n_cohort,
           CAST(r.n_active AS DOUBLE) / c.n_cohort AS retention
    FROM r JOIN c USING (cohort_date)
    """,
)
def q87_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    firsts = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    active = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    joined = active.join(firsts, on="user_id").select(
        "cohort_date",
        F.datediff("d", "cohort_date").alias("day_offset"),
        "user_id",
    ).filter(F.col("day_offset") <= 7)
    ret = joined.groupBy("cohort_date", "day_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    sizes = firsts.groupBy("cohort_date").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return ret.join(F.broadcast(sizes), on="cohort_date").select(
        F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_active",
        "n_cohort",
        (F.col("n_active").cast("double") / F.col("n_cohort")).alias("retention"),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) clustering layout — the lakehouse multi-dimensional
# data-skipping technique (Delta OPTIMIZE ZORDER / Hudi space-filling
# curves): interleaving the bits of two filter dimensions gives ONE sort
# key whose ranges are simultaneously tight in BOTH dimensions, so
# min/max file statistics prune scans on either predicate. Here the
# events table is z-ordered on (user_id, day): the query emits per
# z-range-bucket min/max spans of both dims — the statistics a writer
# would put in the parquet footer. The interleave is 32 shifted bit
# tests folded into one codegen'd integer expression (no UDF); bucketing
# is a uniform partial agg. tests/test_plans.py pins the clustering
# claim: within-bucket spans are a small fraction of the global span for
# BOTH dimensions, which straight sorting on either single key cannot do.
# --------------------------------------------------------------------------
def _morton32(xcol, ycol):
    """Interleave the low 16 bits of x (even positions) and y (odd)."""
    z = F.lit(0).cast("bigint")
    for i in range(16):
        z = (
            z
            + F.shiftleft(F.shiftright(xcol, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ycol, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


_SQL_MORTON = " + ".join(
    f"(((user_id >> {i}) & 1) << {2 * i}) + (((d >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)


@query(
    "q88_zorder_layout",
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(EXTRACT(day FROM ts) AS BIGINT) AS d
      FROM events
    ),
    z AS (SELECT user_id, d, {_SQL_MORTON} AS zval FROM s)
    SELECT zval // 64 AS z_bucket,
           COUNT(*) AS n,
           MIN(user_id) AS min_user, MAX(user_id) AS max_user,
           MIN(d) AS min_day, MAX(d) AS max_day
    FROM z GROUP BY 1
    """,
)
def q88_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir)["events"]
    s = e.select(
        F.col("user_id"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
    )
    z = s.select(
        "user_id", "d", _morton32(F.col("user_id"), F.col("d")).alias("zval")
    )
    return z.groupBy(
        F.floor(F.col("zval") / 64).alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("d").alias("min_day"),
        F.max("d").alias("max_day"),
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape (important stock) adapted to the schema at hand (no
# partsupp table): parts whose lineitem revenue exceeds a fixed fraction
# of TOTAL revenue. The global total is a 1-row aggregate joined back by
# broadcast-nested-loop (tiny build side — the sanctioned scalar-subquery
# plan); the per-part rollup is one partial agg on the uniform p_partkey.
# Decimal-exact sums keep the threshold comparison deterministic at any
# executor count.
# --------------------------------------------------------------------------
@query(
    "q89_important_parts",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, {SUM_D.format('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(revenue) AS total FROM pr)
    SELECT pr.l_partkey AS p_partkey, pr.revenue
    FROM pr, tot
    WHERE pr.revenue > tot.total * 0.0005
    """,
)
def q89_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir)["lineitem"]
    pr = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    tot = pr.agg(F.sum("revenue").alias("total"))
    return (
        pr.join(F.broadcast(tot))
        .filter(F.col("revenue") > F.col("total") * F.lit(0.0005))
        .select("p_partkey", "revenue")
    )


# --------------------------------------------------------------------------
# TPC-H Q16 shape (parts/supplier relationship) adapted: how many
# distinct suppliers serve each (p_brand, p_size) group, EXCLUDING
# suppliers in deficit (s_acctbal < 0 stands in for Q16's complaints
# predicate). The exclusion is an anti-join (never NOT IN's null trap);
# the distinct count is a partial-deduping agg on uniform keys; part is
# the only dim and joins broadcast.
# --------------------------------------------------------------------------
@query(
    "q90_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE NOT EXISTS (
      SELECT 1 FROM supplier s WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey
    )
    GROUP BY p.p_brand, p.p_size
    """,
)
def q90_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    li = t["lineitem"].join(F.broadcast(bad), on="l_suppkey", how="left_anti")
    return (
        li.join(F.broadcast(t["part"]), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# SCD Type-2 dimension versioning — the warehouse idiom for tracking
# attribute history: each customer's orders become versioned rows with
# [valid_from, valid_to) intervals, a monotonically increasing version
# number, and an is_current flag on the open interval. One shuffle on
# the natural key; the interval close is a lead() window over the SAME
# partitioning (no second exchange). Deterministic tie-break: orders on
# the same date version in o_orderkey order. At 100 TB the dimension
# key is uniform and the window never sees more than one key's history
# per task.
# --------------------------------------------------------------------------
@query(
    "q91_scd2_customer_versions",
    oracle="""
    WITH h AS (
      SELECT o_custkey AS c_custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
             o_totalprice AS totalprice,
             ROW_NUMBER() OVER w AS version,
             LEAD(strftime(o_orderdate, '%Y-%m-%d')) OVER w AS valid_to
      FROM orders
      WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT c_custkey, CAST(version AS INT) AS version, valid_from,
           COALESCE(valid_to, '9999-12-31') AS valid_to,
           totalprice,
           (valid_to IS NULL) AS is_current
    FROM h
    """,
)
def q91_scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir)["orders"].filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"  # DuckDB null order
    )
    vf = F.date_format("o_orderdate", "yyyy-MM-dd")
    h = o.select(
        F.col("o_custkey").alias("c_custkey"),
        vf.alias("valid_from"),
        F.col("o_totalprice").alias("totalprice"),
        F.row_number().over(w).cast("int").alias("version"),
        F.lead(vf).over(w).alias("valid_to_raw"),
    )
    return h.select(
        "c_custkey",
        "version",
        "valid_from",
        F.coalesce("valid_to_raw", F.lit("9999-12-31")).alias("valid_to"),
        "totalprice",
        F.col("valid_to_raw").isNull().alias("is_current"),
    )
