"""Graph operators (SURVEY.md §2.2-2.7) as oracle-checked queries.

The driver's oracle is DuckDB over the TPC-H-ish tables, so these queries
run the real PropertyGraph machinery (upserts, neighbors, k-hop, cascade
delete, induced subgraph) on a graph DERIVED from those tables with an
oracle-reproducible id scheme:

    customer c → id = c_custkey*4      (label 'customer')
    order    o → id = o_orderkey*4 + 1 (label 'order')
    part     p → id = p_partkey*4 + 2  (label 'part')
    supplier s → id = s_suppkey*4 + 3  (label 'supplier')

    edges: customer -placed→ order      (from orders)
           order -contains→ part        (distinct from lineitem)
           order -supplied_by→ supplier (distinct from lineitem)

Production ids are xxhash64(label, natural_key) (graph/model.py) — not
SQL-reproducible, so the xxhash path is covered by unit tests instead;
the arithmetic scheme here keeps every graph-semantics query under the
driver's hash-match gate.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongraph_spark.catalog import load_tables, scratch_dir
from pymongraph_spark.graph.model import PropertyGraph
from pymongraph_spark.graph.traversal import find_neighbors, induced_subgraph, k_hop
from pymongraph_spark.graph.writes import delete_vertices, upsert_vertices
from pymongraph_spark.queries.registry import query

# DuckDB CTEs recomputing the derived graph — prefix for graph oracles.
ORACLE_GRAPH_CTE = """
WITH v AS (
  SELECT c_custkey*4   AS id, 'customer' AS label FROM customer
  UNION ALL SELECT o_orderkey*4 + 1, 'order'    FROM orders
  UNION ALL SELECT p_partkey*4  + 2, 'part'     FROM part
  UNION ALL SELECT s_suppkey*4  + 3, 'supplier' FROM supplier
),
e AS (
  SELECT o_custkey*4 AS src, o_orderkey*4 + 1 AS dst, 'placed' AS label FROM orders
  UNION ALL
  SELECT DISTINCT l_orderkey*4 + 1, l_partkey*4 + 2, 'contains' FROM lineitem
  UNION ALL
  SELECT DISTINCT l_orderkey*4 + 1, l_suppkey*4 + 3, 'supplied_by' FROM lineitem
)
"""


# (applicationId, sf_dir, generation-prefix) -> (session, graph).
# applicationId, not id(spark): object ids recycle after GC, so an id()
# key could serve persisted frames bound to a dead context (the r8
# _COOCCUR_CACHE fix, harmonized here per the r8 verdict). The session
# rides along so the sweep can test liveness; the generation-prefix keys
# the testdata fingerprint so driver-regenerated parquet can never be
# served stale.
_GRAPH_CACHE: dict[tuple[str, str, str], tuple["SparkSession", PropertyGraph]] = {}


def _sweep_graph_cache() -> None:
    """Evict entries whose owning session is stopped — their persisted
    vertex/edge frames are dead weight in long-lived processes."""
    for k in [k for k, (s, _) in _GRAPH_CACHE.items() if _session_stopped(s)]:
        del _GRAPH_CACHE[k]


def _graph_table_prefix(sf_dir: str) -> str:
    import hashlib

    # hash() is salted per interpreter — md5 keys the tables stably so a
    # SECOND session (or process) can find the first one's materialization.
    # Two separate tokens: a stable per-sf_dir token, then a GENERATION
    # fingerprint over the source tables' mtime+size. Regenerated testdata
    # (the driver rewrites it between rounds) changes the generation, so a
    # stale derived graph can never be silently reused — while the stable
    # token lets the GC below distinguish "old generation of THIS sf_dir"
    # (safe to delete) from "cache of a DIFFERENT sf_dir" (must keep:
    # test/bench/driver processes at different scales would otherwise
    # evict each other's caches).
    sf_tok = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    h = hashlib.md5()
    for t in ("customer", "orders", "part", "supplier", "lineitem"):
        try:
            st = os.stat(f"{sf_dir}/{t}.parquet")
            h.update(f"{t}:{st.st_mtime_ns}:{st.st_size}".encode())
        except OSError:
            pass
    return f"tpch_graph_{sf_tok}_{h.hexdigest()[:8]}"


def tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    """Derive the property graph from the star schema. One pass, no UDFs;
    edge dedup via dropDuplicates (the W2 triple-dedup semantic).

    Materialization: the edge dedup is the one real shuffle here, and
    every graph query would otherwise repeat it. First build per sf_dir
    writes the graph ONCE as bucketed tables under the warehouse dir
    (save_bucketed — the layout that also co-locates frontier joins);
    any later session load-if-exists's them, so its first graph query
    skips the lineitem dedup shuffle entirely. In-memory memo per
    (session, sf_dir) on top. Cross-process reuse additionally needs a
    persistent metastore (the in-memory catalog forgets table names at
    JVM exit); without one the build just reruns — a cache, not a
    correctness dependency.
    """
    prefix = _graph_table_prefix(sf_dir)
    try:
        key = (spark.sparkContext.applicationId, sf_dir, prefix)
    except Exception:  # stopped context — build uncached, fail in use
        key = None
    _sweep_graph_cache()
    if key is not None and key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key][1]
    from pymongraph_spark.graph.store import (
        load_bucketed,
        register_bucketed_external,
        save_bucketed,
    )
    g = None
    try:
        known = spark.catalog.tableExists(f"{prefix}_vertices") and spark.catalog.tableExists(
            f"{prefix}_adjacency"
        )
        # A fresh process's in-memory catalog has forgotten the tables even
        # though the files survived — re-attach them instead of rebuilding.
        if known or register_bucketed_external(spark, prefix, buckets=16):
            g, _ = load_bucketed(spark, prefix)
            _mark_graph_cache_used(spark, prefix)
    except Exception:
        g = None
    if g is None:
        g = _build_tpch_graph(spark, sf_dir)
        try:
            save_bucketed(g, prefix, buckets=16)
            g, _ = load_bucketed(spark, prefix)
            _mark_graph_cache_used(spark, prefix)
            _drop_stale_graph_caches(spark, keep_prefix=prefix)
        except Exception:
            # read-only warehouse etc. — fall back to session-local persist
            pass
    g = PropertyGraph(g.vertices.persist(), g.edges.persist())
    if key is not None:
        _GRAPH_CACHE[key] = (spark, g)
        # drop superseded generations of the same (application, sf_dir)
        # and release their persist pins
        for k in [k for k in _GRAPH_CACHE if k[:2] == key[:2] and k != key]:
            _, old = _GRAPH_CACHE.pop(k)
            for df in (old.vertices, old.edges):
                try:
                    df.unpersist()
                except Exception:
                    pass
    return g


def tpch_adjacency(spark: SparkSession, sf_dir: str):
    """The bucketed adjacency table for this sf_dir's derived graph, or
    None when the bucketed layout isn't available (read-only warehouse).

    The adjacency table already stores BOTH orientations of every edge,
    bucketed + sorted by the incident vertex — exactly the symmetrized
    message frame iterative algorithms (hash-min CC, label propagation)
    otherwise rebuild per call with a union + repartition + dedup. Callers
    route through it to make the edge side of a fixpoint loop a plain
    bucketed scan: zero edge shuffles per call, at any scale.
    """
    tpch_graph(spark, sf_dir)  # ensure built/attached
    prefix = _graph_table_prefix(sf_dir)
    try:
        if spark.catalog.tableExists(f"{prefix}_adjacency"):
            from pymongraph_spark.graph.store import load_bucketed

            _, adjacency = load_bucketed(spark, prefix)
            return adjacency
    except Exception:
        pass
    return None


# A stale-generation cache dir is deleted only when nothing has attached
# it within this window. Readers touch _LAST_USED at attach time
# (_touch_last_used), so a concurrent process that resolved its prefix to
# the old generation BEFORE testdata regeneration keeps its files alive
# while it is still querying them; 30 min comfortably exceeds any single
# query/bench run in this repo. Overridable for tests — read at CALL
# time (like store.save's version GC) so setting the env var after
# import behaves the same for every GC in the repo.


def _gc_grace_seconds() -> int:
    return int(os.environ.get("SPARKGRAPH_GC_GRACE_SECONDS", "1800"))


def _mark_graph_cache_used(spark: SparkSession, prefix: str) -> None:
    """Stamp both table dirs of an attached cache so a concurrent
    process's GC (age-gated below) leaves them alone mid-query."""
    from pymongraph_spark.graph.store import _warehouse_path

    for suffix in ("vertices", "adjacency"):
        _touch_last_used(_warehouse_path(spark, f"{prefix}_{suffix}"))


def _touch_last_used(path: str) -> None:
    """Mark a cache table dir as in-use (underscore files are invisible to
    Spark's file listing, like _SUCCESS)."""
    try:
        with open(os.path.join(path, "_LAST_USED"), "w") as fh:
            fh.write(str(int(time.time())))
    except OSError:
        pass


def _recently_used(path: str) -> bool:
    """True when the dir's _LAST_USED marker (or, for pre-marker saves,
    the dir mtime) falls within the GC grace window."""
    marker = os.path.join(path, "_LAST_USED")
    try:
        ts = int(open(marker).read().strip())
    except (OSError, ValueError):
        try:
            ts = int(os.stat(path).st_mtime)
        except OSError:
            return False
    return (time.time() - ts) < _gc_grace_seconds()


def drop_stale_generations(spark: SparkSession, sf_tok: str, gen: str, parse) -> None:
    """Age-gated warehouse GC shared by every fingerprinted cache family
    (derived graphs, bucketed relational pairs): removes dirs whose
    ``parse(dirname)`` yields (tok, generation) with tok == sf_tok but a
    DIFFERENT generation (regenerated testdata — those can never be
    loaded again, only block future saves). Caches of other sf_dirs are
    left alone: concurrent test/bench/driver processes at different
    scales must not evict each other. Deletion is age-gated
    (_recently_used): a concurrent process that attached the old
    generation before regeneration may still be mid-query over those
    files — they get collected on a later pass once the grace window
    lapses."""
    from pymongraph_spark.graph.store import _warehouse_path

    wh_root = os.path.dirname(_warehouse_path(spark, "x"))
    if not os.path.isdir(wh_root):
        return
    for d in os.listdir(wh_root):
        parsed = parse(d)
        if not parsed:
            continue
        tok, g = parsed
        if tok == sf_tok and g != gen:
            try:
                full = os.path.join(wh_root, d)
                if not spark.catalog.tableExists(d) and not _recently_used(full):
                    shutil.rmtree(full, ignore_errors=True)
            except Exception:
                pass


def _drop_stale_graph_caches(spark: SparkSession, keep_prefix: str) -> None:
    # keep_prefix = "tpch_graph_<sf_tok>_<gen>"; dir names are
    # "<fam>_graph_<sf_tok>_<gen>_<table suffix...>" (tpch_ and g41_ alike)
    parts = keep_prefix.rsplit("_", 2)
    if len(parts) != 3:
        return

    def parse(d: str):
        p = d.split("_")
        if len(p) >= 5 and p[1] == "graph":
            return p[2], p[3]
        return None

    drop_stale_generations(spark, parts[1], parts[2], parse)


def _build_tpch_graph(spark: SparkSession, sf_dir: str) -> PropertyGraph:
    t = load_tables(spark, sf_dir)
    vertices = (
        t["customer"].select((F.col("c_custkey") * 4).alias("id"), F.lit("customer").alias("label"),
                             F.map_from_arrays(F.array(F.lit("name")), F.array(F.col("c_name"))).alias("props"))
        .unionByName(t["orders"].select((F.col("o_orderkey") * 4 + 1).alias("id"), F.lit("order").alias("label"),
                                        F.map_from_arrays(F.array(F.lit("status")), F.array(F.col("o_orderstatus"))).alias("props")))
        .unionByName(t["part"].select((F.col("p_partkey") * 4 + 2).alias("id"), F.lit("part").alias("label"),
                                      F.map_from_arrays(F.array(F.lit("name")), F.array(F.col("p_name"))).alias("props")))
        .unionByName(t["supplier"].select((F.col("s_suppkey") * 4 + 3).alias("id"), F.lit("supplier").alias("label"),
                                          F.map_from_arrays(F.array(F.lit("name")), F.array(F.col("s_name"))).alias("props")))
    )
    empty_props = F.lit(None).cast("map<string,string>")
    edges = (
        t["orders"].select((F.col("o_custkey") * 4).alias("src"), (F.col("o_orderkey") * 4 + 1).alias("dst"),
                           F.lit("placed").alias("label"))
        .unionByName(t["lineitem"].select((F.col("l_orderkey") * 4 + 1).alias("src"), (F.col("l_partkey") * 4 + 2).alias("dst"),
                                          F.lit("contains").alias("label")).dropDuplicates())
        .unionByName(t["lineitem"].select((F.col("l_orderkey") * 4 + 1).alias("src"), (F.col("l_suppkey") * 4 + 3).alias("dst"),
                                          F.lit("supplied_by").alias("label")).dropDuplicates())
        .withColumn("props", empty_props)
        .withColumn("id", F.xxhash64("src", "dst", "label"))
        .select("id", "src", "dst", "label", "props")
    )
    return PropertyGraph(vertices, edges)


# --------------------------------------------------------------------------
# Degree distribution per label — exercises the derived graph build + the
# union-of-equi-joins incident pattern, aggregated.
# --------------------------------------------------------------------------
@query(
    "g30_degree_by_label",
    oracle=ORACLE_GRAPH_CTE
    + """
    , deg AS (
      SELECT id, count(*) AS degree FROM (
        SELECT src AS id FROM e UNION ALL SELECT dst FROM e
      ) GROUP BY id
    )
    SELECT v.label,
           COUNT(*) AS n_vertices,
           CAST(COALESCE(SUM(deg.degree), 0) AS BIGINT) AS total_degree,
           CAST(MAX(COALESCE(deg.degree, 0)) AS BIGINT) AS max_degree
    FROM v LEFT JOIN deg ON v.id = deg.id
    GROUP BY v.label
    """,
)
def g30_degree_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    deg = (
        g.edges.select(F.col("src").alias("id"))
        .unionByName(g.edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        g.vertices.join(deg, on="id", how="left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.coalesce(F.sum("degree"), F.lit(0)).cast("bigint").alias("total_degree"),
            F.max(F.coalesce(F.col("degree"), F.lit(0))).cast("bigint").alias("max_degree"),
        )
    )


# --------------------------------------------------------------------------
# G1 find_neighbors — undirected 1-hop, B7 semantics (query vertex included
# as an endpoint of its own incident edges).
# --------------------------------------------------------------------------
@query(
    "g31_neighbors_of_customer1",
    oracle=ORACLE_GRAPH_CTE
    + """
    SELECT DISTINCT id FROM (
      SELECT src AS id FROM e WHERE src = 4 OR dst = 4
      UNION ALL
      SELECT dst FROM e WHERE src = 4 OR dst = 4
    )
    """,
)
def g31_neighbors_of_customer1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    nbr_ids, _edges = find_neighbors(g, 4)  # customer c_custkey=1 → id 4
    return nbr_ids


# --------------------------------------------------------------------------
# G2 k-hop — 2-hop ego network of customer 1 with labels.
# --------------------------------------------------------------------------
@query(
    "g32_two_hop_customer1",
    oracle=ORACLE_GRAPH_CTE
    + """
    , hop1 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT dst FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT 4
      )
    ),
    hop2 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL
        SELECT dst FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL SELECT id FROM hop1
      )
    )
    SELECT h.id, v.label FROM hop2 h JOIN v ON h.id = v.id
    """,
)
def g32_two_hop_customer1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    visited, _edges = k_hop(g, 4, depth=2)
    # No FORCED broadcast: a 2-hop neighborhood from this root is ~100
    # rows and AQE will broadcast it from actual runtime size — but a hub
    # root at corpus scale can explode visited past driver memory, and a
    # hint would OOM where AQE falls back to a shuffle join.
    return (
        g.vertices.join(visited.select("id"), on="id", how="inner")
        .select("id", "label")
    )


# --------------------------------------------------------------------------
# G3 induced subgraph — vertex/edge counts of the depth-2 ego network.
# --------------------------------------------------------------------------
@query(
    "g33_subgraph_counts_customer1",
    oracle=ORACLE_GRAPH_CTE
    + """
    , hop1 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT dst FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT 4
      )
    ),
    hop2 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL
        SELECT dst FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL SELECT id FROM hop1
      )
    )
    SELECT (SELECT COUNT(*) FROM hop2 h JOIN v ON h.id = v.id) AS n_vertices,
           (SELECT COUNT(*) FROM e
             WHERE src IN (SELECT id FROM hop2) AND dst IN (SELECT id FROM hop2)) AS n_edges
    """,
)
def g33_subgraph_counts_customer1(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    visited, _ = k_hop(g, 4, depth=2)
    sub = induced_subgraph(g, visited)
    n_v = sub.vertices.count()
    n_e = sub.edges.count()
    return spark.createDataFrame([(n_v, n_e)], "n_vertices: long, n_edges: long")


# --------------------------------------------------------------------------
# D1 cascade delete — drop all BUILDING-segment customers; edges incident
# to them (either direction) must vanish. Remaining edge count per label.
# --------------------------------------------------------------------------
@query(
    "g34_cascade_delete_building",
    oracle=ORACLE_GRAPH_CTE
    + """
    , doomed AS (SELECT c_custkey*4 AS id FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT label, COUNT(*) AS n_edges
    FROM e
    WHERE src NOT IN (SELECT id FROM doomed) AND dst NOT IN (SELECT id FROM doomed)
    GROUP BY label
    """,
)
def g34_cascade_delete_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    doomed = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 4).alias("id")
    )
    g2 = delete_vertices(g, doomed)
    return g2.edges.groupBy("label").agg(F.count(F.lit(1)).alias("n_edges"))


# --------------------------------------------------------------------------
# W1 upsert idempotency — upserting the customer vertex batch TWICE through
# the real natural-key upsert path yields exactly one vertex per key.
# --------------------------------------------------------------------------
@query(
    "g35_upsert_idempotency",
    oracle="""
    SELECT 'customer' AS label, COUNT(DISTINCT c_custkey) AS n_vertices FROM customer
    """,
)
def g35_upsert_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    data = t["customer"].select(F.col("c_custkey").cast("string").alias("custkey"), F.col("c_name").alias("name"))
    registry = {"customer": {"custkey"}}
    g = PropertyGraph.empty(spark)
    g = upsert_vertices(g, "customer", data, key="custkey", registry=registry)
    g = upsert_vertices(g, "customer", data, key="custkey", registry=registry)  # idempotent re-import
    return g.vertices.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))


# --------------------------------------------------------------------------
# L1 batch hydration (mongraph.py:29-44): the N+1 point-lookup loop as one
# broadcast join against a literal id list.
# --------------------------------------------------------------------------
@query(
    "g36_hydrate_vertices",
    oracle=ORACLE_GRAPH_CTE
    + """
    SELECT id, label FROM v WHERE id IN (4, 8, 12, 5, 9, 6, 7)
    """,
)
def g36_hydrate_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    ids = spark.createDataFrame([(i,) for i in [4, 8, 12, 5, 9, 6, 7]], "id: long")
    return g.hydrate_vertices(ids).select("id", "label")


# --------------------------------------------------------------------------
# Connected components (hash-min label propagation) on the 'placed'
# subgraph — structure is known (one component per customer with orders,
# singletons otherwise), so the fixpoint result is SQL-checkable.
# --------------------------------------------------------------------------
@query(
    "g37_connected_components_placed",
    oracle="""
    WITH cust AS (
      SELECT c_custkey*4 AS id,
             LEAST(c_custkey*4, COALESCE(MIN(o_orderkey*4 + 1), c_custkey*4)) AS component
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    ),
    ords AS (
      SELECT o_orderkey*4 + 1 AS id, cust.component
      FROM orders JOIN cust ON cust.id = o_custkey*4
    )
    SELECT id, component FROM cust
    UNION ALL
    SELECT id, component FROM ords
    """,
)
def g37_connected_components_placed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import (
        connected_components,
        connected_components_adjacency,
    )

    g = tpch_graph(spark, sf_dir)
    verts = g.vertices.filter(F.col("label").isin("customer", "order")).select("id")
    # Preferred path: the bucketed adjacency is already the symmetrized
    # message frame — zero edge shuffles per call (see the operator doc).
    adjacency = tpch_adjacency(spark, sf_dir)
    if adjacency is not None:
        return connected_components_adjacency(verts, adjacency, label="placed")
    placed = g.edges.filter(F.col("label") == "placed")
    return connected_components(verts, placed)


# --------------------------------------------------------------------------
# PageRank — iterative float sums are not oracle-matchable across engines;
# rows-only gate + unit-test invariants (Σrank ≈ |V|).
# --------------------------------------------------------------------------
@query("g38_pagerank")
def g38_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import pagerank

    g = tpch_graph(spark, sf_dir)
    return pagerank(g.vertices, g.edges, max_iter=5)


# --------------------------------------------------------------------------
# PageRank, exact tier: g38's anchor. Scaled-integer arithmetic (floor
# division only) makes the fixpoint bit-identical across engines; the
# oracle unrolls the fixed iteration count as chained CTEs (pr0..prN) —
# no recursive-CTE reference restrictions, same update rule verbatim.
# --------------------------------------------------------------------------
_G48_ITERS = 4
_G48_SCALE = 10**9


def _g48_oracle(iters: int = _G48_ITERS, scale: int = _G48_SCALE) -> str:
    base = 15 * scale // 100
    parts = [
        ORACLE_GRAPH_CTE,
        ", od AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f", pr0 AS (SELECT id, CAST({scale} AS BIGINT) AS rank FROM v)",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
    , pr{k} AS (
      SELECT v.id,
             CAST({base} + (85 * COALESCE(c.inflow, 0)) // 100 AS BIGINT) AS rank
      FROM v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.rank // od.outdeg) AS inflow
        FROM pr{k - 1} p JOIN e ON p.id = e.src JOIN od ON od.id = e.src
        GROUP BY e.dst
      ) c ON v.id = c.id
    )""")
    parts.append(f"SELECT id, rank FROM pr{iters}")
    return "".join(parts)


@query("g48_pagerank_exact", oracle=_g48_oracle())
def g48_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import pagerank_exact

    g = tpch_graph(spark, sf_dir)
    return pagerank_exact(g.vertices, g.edges, max_iter=_G48_ITERS, scale=_G48_SCALE)


# --------------------------------------------------------------------------
# Labeled-path motif (MATCH-style pattern compiled to joins, SURVEY §4):
# customer X -placed→ order -supplied_by→ supplier ←supplied_by- order
# ←placed- other customers: "customers sharing a supplier with customer 1",
# with the shared-supplier count.
# --------------------------------------------------------------------------
@query(
    "g39_shared_supplier_motif",
    oracle=ORACLE_GRAPH_CTE
    + """
    , my_suppliers AS (
      SELECT DISTINCT e2.dst AS supplier_id
      FROM e e1 JOIN e e2 ON e1.dst = e2.src
      WHERE e1.label = 'placed' AND e1.src = 4 AND e2.label = 'supplied_by'
    ),
    other AS (
      SELECT e1.src AS customer_id, e2.dst AS supplier_id
      FROM e e1 JOIN e e2 ON e1.dst = e2.src
      WHERE e1.label = 'placed' AND e1.src <> 4 AND e2.label = 'supplied_by'
    )
    SELECT customer_id, CAST(COUNT(DISTINCT o.supplier_id) AS BIGINT) AS shared_suppliers
    FROM other o JOIN my_suppliers m ON o.supplier_id = m.supplier_id
    GROUP BY customer_id
    HAVING COUNT(DISTINCT o.supplier_id) >= 3
    """,
)
def g39_shared_supplier_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    placed = g.edges.filter(F.col("label") == "placed").select(
        F.col("src").alias("customer_id"), F.col("dst").alias("order_id")
    )
    supplied = g.edges.filter(F.col("label") == "supplied_by").select(
        F.col("src").alias("order_id"), F.col("dst").alias("supplier_id")
    )
    cust_supp = placed.join(supplied, on="order_id").select("customer_id", "supplier_id")
    mine = (
        cust_supp.filter(F.col("customer_id") == 4)
        .select("supplier_id")
        .distinct()
    )
    return (
        cust_supp.filter(F.col("customer_id") != 4)
        .join(F.broadcast(mine), on="supplier_id", how="left_semi")
        .groupBy("customer_id")
        .agg(F.count_distinct("supplier_id").alias("shared_suppliers"))
        .filter(F.col("shared_suppliers") >= 3)
    )


# --------------------------------------------------------------------------
# U1 under the gate: batch property update ($set merge) on the derived
# graph, result observable via the updated props.
# --------------------------------------------------------------------------
@query(
    "g40_update_vertex_props",
    oracle="""
    SELECT CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'normal' END AS tier,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY 1
    """,
)
def g40_update_vertex_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.graph.writes import update_vertices

    g = tpch_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    updates = t["customer"].select(
        (F.col("c_custkey") * 4).alias("id"),
        F.create_map(
            F.lit("tier"),
            F.when(F.col("c_acctbal") >= 5000, F.lit("high")).otherwise(F.lit("normal")),
        ).alias("props"),
    )
    g2 = update_vertices(g, updates)
    return (
        g2.vertices.filter(F.col("label") == "customer")
        .groupBy(F.col("props")["tier"].alias("tier"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Bucketed-store traversal — the at-scale storage layout end-to-end:
# save the derived graph as bucketed tables (vertices by id, adjacency by
# incident vertex), then k-hop over the bucketed adjacency (the edge side
# is never shuffled per hop — proven in test_bucketing.py). Same oracle
# as g32: the layout must not change the answer.
# --------------------------------------------------------------------------
@query(
    "g41_bucketed_two_hop",
    oracle=ORACLE_GRAPH_CTE
    + """
    , hop1 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT dst FROM e WHERE src = 4 OR dst = 4
        UNION ALL SELECT 4
      )
    ),
    hop2 AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL
        SELECT dst FROM e WHERE src IN (SELECT id FROM hop1) OR dst IN (SELECT id FROM hop1)
        UNION ALL SELECT id FROM hop1
      )
    )
    SELECT h.id, v.label FROM hop2 h JOIN v ON h.id = v.id
    """,
)
def g41_bucketed_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.graph.store import k_hop_bucketed, load_bucketed, save_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # Stable (fingerprinted) name so a rerun overwrites rather than
    # accumulating one orphaned warehouse dir per process (hash() is
    # salted per interpreter; _graph_table_prefix is not).
    prefix = _graph_table_prefix(sf_dir).replace("tpch_graph_", "g41_graph_")
    # attach-or-build (same lifecycle as tpch_graph / the bktj pair): a
    # fresh process re-attaches the surviving bucketed files instead of
    # rmtree-rebuilding under a possible concurrent reader
    from pymongraph_spark.graph.store import register_bucketed_external

    known = spark.catalog.tableExists(f"{prefix}_vertices") and spark.catalog.tableExists(
        f"{prefix}_adjacency"
    )
    if not (known or register_bucketed_external(spark, prefix, buckets=8)):
        g = tpch_graph(spark, sf_dir)
        save_bucketed(g, prefix, buckets=8)
    gb, adjacency = load_bucketed(spark, prefix)
    _mark_graph_cache_used(spark, prefix)
    visited, _edges = k_hop_bucketed(adjacency, 4, depth=2)
    # AQE-decided join (same hub-explosion reasoning as g32).
    return (
        gb.vertices.join(visited.select("id"), on="id", how="inner")
        .select("id", "label")
    )


# --------------------------------------------------------------------------
# BFS minimum hop distances — distinct from k_hop (which returns the
# visited SET): every vertex within 3 undirected hops of customer 1 gets
# its first-reached depth. Oracle: bounded recursive CTE + MIN(dist).
# --------------------------------------------------------------------------
@query(
    "g42_bfs_distances",
    oracle=ORACLE_GRAPH_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , und AS (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ),
    bfs AS (
      SELECT CAST(4 AS BIGINT) AS id, 0 AS dist
      UNION
      SELECT und.dst AS id, bfs.dist + 1 AS dist
      FROM bfs JOIN und ON und.src = bfs.id
      WHERE bfs.dist < 3
    )
    SELECT id, CAST(MIN(dist) AS BIGINT) AS distance
    FROM bfs GROUP BY id
    """,
)
def g42_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import bfs_distances

    g = tpch_graph(spark, sf_dir)
    return bfs_distances(g.edges, source=4, max_depth=3, undirected=True)


_COOCCUR_CACHE: dict[tuple, tuple["SparkSession", DataFrame]] = {}


def _session_stopped(spark) -> bool:
    """True once the session's SparkContext is gone — its checkpointed
    frames are unusable and the cache entry is a leak."""
    try:
        jsc = spark.sparkContext._jsc
        return jsc is None or jsc.sc().isStopped()
    except Exception:
        return True


def _part_cooccurrence(t: dict) -> DataFrame:
    """Part co-purchase projection shared by g43/g47/g49/g55 (and their
    oracles, via ORACLE_COOCCUR_CTE): undirected src<dst edges between
    parts appearing in the same order at least twice. ONE definition —
    the n >= 2 threshold must stay in lock-step with the oracle CTE.

    The projection is a shared substrate: computing it is an edge-scale
    self-join of (orderkey, partkey) pairs, but its OUTPUT is a small
    edge list (~3.6k rows at sf0.1). Like the derived graph, it is
    therefore materialized once per (session, sf_dir, lineitem
    generation) — at 100 TB you'd persist this projection as a table and
    every co-purchase analysis would read it, not re-join lineitem. The
    generation fingerprint (mtime+size, same scheme as
    _graph_table_prefix) means regenerated testdata can never serve a
    stale projection; the memo holds a localCheckpoint, so no lineage
    or cache-manager pin survives its eviction. Plan-lint note: the
    projection's pre-checkpoint plan is captured and swept on the
    cache-MISS call (the first co-purchase query per session); cache
    hits reuse the already-linted segment."""
    op = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("src", "dst")
    )
    spark = getattr(t, "_spark", None)
    sf_dir = getattr(t, "_sf_dir", None)
    if spark is None or sf_dir is None:  # plain-dict caller: no memo
        return co
    try:
        st = os.stat(f"{sf_dir}/lineitem.parquet")
        # applicationId is stable and unique per SparkContext — unlike
        # id(spark), which a later session object can recycle after GC
        # and thereby serve a checkpointed frame bound to a dead context
        key = (spark.sparkContext.applicationId, sf_dir, st.st_mtime_ns, st.st_size)
    except Exception:  # OSError, or applicationId on a stopped context
        return co
    # sweep entries whose owning session has been stopped — their
    # localCheckpoint pins are dead weight in long-lived processes
    for k in [k for k, (s, _) in _COOCCUR_CACHE.items() if _session_stopped(s)]:
        del _COOCCUR_CACHE[k]
    if key not in _COOCCUR_CACHE:
        _COOCCUR_CACHE[key] = (spark, co.localCheckpoint(eager=True))
        # drop stale generations of the same (application, sf_dir) so a
        # long-lived session doesn't pin superseded checkpoints
        for k in [k for k in _COOCCUR_CACHE if k[:2] == key[:2] and k != key]:
            del _COOCCUR_CACHE[k]
    return _COOCCUR_CACHE[key][1]


# --------------------------------------------------------------------------
# Triangle counting — per-vertex counts over the part co-occurrence
# projection (parts appearing together in ≥2 distinct orders; the derived
# property graph itself is tripartite and triangle-free). The Spark
# operator orients edges by degree before the wedge join (node-iterator++,
# skew-bounded); the oracle is the naive a<b<c three-way join — different
# algorithms, identical triangle set.
# --------------------------------------------------------------------------
# DuckDB CTE recomputing _part_cooccurrence verbatim — shared prefix for
# every oracle over the co-purchase projection (g43/g49/g55), so the
# n >= 2 threshold can never drift between them.
ORACLE_COOCCUR_CTE = """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    eg AS MATERIALIZED (SELECT p1, p2 FROM pairs WHERE n >= 2)
"""


@query(
    "g43_triangle_counts",
    oracle=ORACLE_COOCCUR_CTE
    + """
    , tri AS (
      SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
      FROM eg e1 JOIN eg e2 ON e1.p2 = e2.p1
                 JOIN eg e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT id, COUNT(*) AS n_triangles FROM (
      SELECT a AS id FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
    ) GROUP BY id
    """,
)
def g43_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import triangle_count

    t = load_tables(spark, sf_dir)
    co = _part_cooccurrence(t)
    return triangle_count(co)


# --------------------------------------------------------------------------
# Hop-bounded weighted shortest paths (Bellman-Ford relaxation) — min COST
# within ≤3 hops of customer 1, with integer per-label edge weights
# (placed=1, contains=2, supplied_by=3) so the min-fold is exact in both
# engines. The oracle enumerates all ≤3-hop paths in a bounded recursive
# CTE and takes the per-vertex min; BFS (g42) would give hop counts, not
# costs — a path of two cheap edges can beat one expensive edge here.
# --------------------------------------------------------------------------
_G44_WEIGHT = "CASE label WHEN 'placed' THEN 1 WHEN 'contains' THEN 2 ELSE 3 END"


@query(
    "g44_weighted_shortest_paths",
    oracle=ORACLE_GRAPH_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + f"""
    , und AS (
      SELECT src, dst, {_G44_WEIGHT} AS w FROM e
      UNION ALL
      SELECT dst, src, {_G44_WEIGHT} AS w FROM e
    ),
    walk AS (
      SELECT CAST(4 AS BIGINT) AS id, CAST(0 AS BIGINT) AS cost, 0 AS hops
      UNION
      SELECT und.dst, walk.cost + und.w, walk.hops + 1
      FROM walk JOIN und ON und.src = walk.id
      WHERE walk.hops < 3
    )
    SELECT id, MIN(cost) AS cost FROM walk GROUP BY id
    """,
)
def g44_weighted_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import shortest_paths_weighted

    g = tpch_graph(spark, sf_dir)
    weighted = g.edges.select(
        "src",
        "dst",
        F.when(F.col("label") == "placed", 1)
        .when(F.col("label") == "contains", 2)
        .otherwise(3)
        .cast("long")
        .alias("weight"),
    )
    return shortest_paths_weighted(weighted, source=4, max_hops=3, undirected=True)


# --------------------------------------------------------------------------
# Versioned-store time travel — the mutation story end-to-end under the
# gate: persist the graph (v1), cascade-delete the BUILDING-segment
# customers and persist again (v2), then read BOTH versions back by id.
# The v1 row proves deletes don't destroy history within the retention
# window (Delta VERSION AS OF semantics on the parquet version-swap
# store); the v2 row re-proves the D1 cascade on the post-rollback read.
# --------------------------------------------------------------------------
@query(
    "g45_store_time_travel",
    oracle=ORACLE_GRAPH_CTE
    + """
    , doomed AS (SELECT c_custkey*4 AS id FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'v1' AS snapshot,
           (SELECT COUNT(*) FROM v) AS n_vertices,
           (SELECT COUNT(*) FROM e) AS n_edges
    UNION ALL
    SELECT 'v2',
           (SELECT COUNT(*) FROM v WHERE id NOT IN (SELECT id FROM doomed)),
           (SELECT COUNT(*) FROM e WHERE src NOT IN (SELECT id FROM doomed)
                                     AND dst NOT IN (SELECT id FROM doomed))
    """,
)
def g45_store_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:

    from pymongraph_spark.graph import store

    g = tpch_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    path = scratch_dir("g45_store", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store.save(g, path)
    v1 = store.versions(path)[-1]
    doomed = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 4).alias("id")
    )
    store.save(delete_vertices(g, doomed), path)
    rows = []
    for tag, ver in (("v1", v1), ("v2", None)):
        snap = store.load(spark, path, version=ver)
        rows.append((tag, snap.vertices.count(), snap.edges.count()))
    return spark.createDataFrame(rows, "snapshot: string, n_vertices: long, n_edges: long")


# --------------------------------------------------------------------------
# Recursive CTE IN SPARK SQL (4.x): the g42 BFS expressed as WITH
# RECURSIVE over the derived graph's edge view — the SQL-recursion front
# door, cross-checking the imperative frontier loop against the engine's
# own fixpoint operator. Same oracle as g42. Spark's recursion supports
# only UNION ALL, so termination comes from the hop bound and the final
# MIN dedups walks; the imperative bfs_distances (g42) with its visited
# anti-join is therefore the at-scale path — this query documents the
# SQL surface and its walk-enumeration cost, not a replacement.
# --------------------------------------------------------------------------
@query(
    "g46_bfs_recursive_sql",
    oracle=ORACLE_GRAPH_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , und AS (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ),
    bfs AS (
      SELECT CAST(4 AS BIGINT) AS id, 0 AS dist
      UNION
      SELECT und.dst AS id, bfs.dist + 1 AS dist
      FROM bfs JOIN und ON und.src = bfs.id
      WHERE bfs.dist < 3
    )
    SELECT id, CAST(MIN(dist) AS BIGINT) AS distance
    FROM bfs GROUP BY id
    """,
)
def g46_bfs_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    view = f"__g46_edges_{abs(hash(sf_dir)) % 10**8}"
    g.edges.select("src", "dst").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE bfs AS (
          SELECT CAST(4 AS BIGINT) AS id, 0 AS dist
          UNION ALL
          SELECT u.dst AS id, bfs.dist + 1 AS dist
          FROM bfs
          JOIN (SELECT src, dst FROM {view}
                UNION SELECT dst, src FROM {view}) u
            ON u.src = bfs.id
          WHERE bfs.dist < 3
        )
        SELECT id, CAST(MIN(dist) AS BIGINT) AS distance
        FROM bfs GROUP BY id
        """
    )


# --------------------------------------------------------------------------
# k-core decomposition — peel-to-FIXPOINT is not expressible in SQL
# recursion (deletion is non-monotone), so g47 ships rows-only with
# golden-graph unit tests; its exact-twin anchor g55 below runs the SAME
# peel under a fixed round budget, which IS oracle-checkable (the g48/s57
# recipe). Both run over the part co-occurrence projection (same
# substrate as g43).
# --------------------------------------------------------------------------
_G55_ROUNDS = 8
_G56_ROUNDS = 32  # 2x the deepest measured convergence (16 at sf0.01)


def _g55_oracle(rounds: int = _G55_ROUNDS, k: int = 3) -> str:
    """Unrolled synchronous peel: d{r} degrees on the surviving edge set,
    k{r} the >= k survivors, s{r} the induced edges — the identical
    update rule k_core runs per iteration, as chained CTEs."""
    parts = [ORACLE_COOCCUR_CTE, ", s0 AS MATERIALIZED (SELECT p1 AS u, p2 AS v FROM eg)"]
    for r in range(1, rounds + 1):
        parts.append(f"""
    , d{r} AS MATERIALIZED (
      SELECT id, COUNT(*) AS deg FROM (
        SELECT u AS id FROM s{r - 1} UNION ALL SELECT v FROM s{r - 1}) GROUP BY id
    ), k{r} AS MATERIALIZED (SELECT id FROM d{r} WHERE deg >= {k})
    , s{r} AS MATERIALIZED (
      SELECT s.u, s.v FROM s{r - 1} s
      JOIN k{r} a ON s.u = a.id JOIN k{r} b ON s.v = b.id
    )""")
    parts.append(
        f"SELECT DISTINCT id FROM "
        f"(SELECT u AS id FROM s{rounds} UNION ALL SELECT v FROM s{rounds})"
    )
    return "".join(parts)


@query("g47_kcore_parts", oracle=_g55_oracle(rounds=_G56_ROUNDS))
def g47_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged 3-core membership. Oracled since r15 (VERDICT r14 item
    5): the call is byte-identical to g56's — k_core's default
    max_iter=50 IS g56's explicit 50 — so the 32-round unrolled
    synchronous-peel oracle that hash-matches g56's converged peel
    hash-matches this row too (convergence depth measured 12-16 rounds
    across sf0.001-0.1; a peel that needed more than 32 rounds would
    turn BOTH rows red rather than silently passing)."""
    from pymongraph_spark.operators.graph_algos import k_core

    t = load_tables(spark, sf_dir)
    co = _part_cooccurrence(t)
    return k_core(co, k=3)


@query("g55_kcore_exact", oracle=_g55_oracle())
def g55_kcore_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g47's exact-twin anchor (VERDICT r6 #4, the g48/s57 recipe): the
    SAME k_core peel capped at a FIXED round budget. State-after-R-rounds
    is engine-checkable — the oracle unrolls R synchronous peel rounds as
    chained CTEs — and the operator's early convergence break cannot
    diverge from it: once the peel reaches a fixpoint, further rounds are
    idempotent, so equality holds whether or not the peel converged by
    round R. All-integer state (vertex ids, counts): bit-exact across
    engines."""
    from pymongraph_spark.operators.graph_algos import k_core

    t = load_tables(spark, sf_dir)
    co = _part_cooccurrence(t)
    return k_core(co, k=3, max_iter=_G55_ROUNDS)


def _g49_oracle(iters: int = 5) -> str:
    """Unrolled deterministic synchronous LPA: m{k} neighbor-label votes,
    b{k} the argmax (count DESC, label ASC — the exact tie-break
    label_propagation uses), l{k} the adopted labels. All-integer state,
    so the fixed-iteration sweep is bit-identical across engines."""
    parts = [
        ORACLE_COOCCUR_CTE,
        ", und AS (SELECT p1 AS src, p2 AS dst FROM eg"
        " UNION ALL SELECT p2, p1 FROM eg)",
        ", l0 AS (SELECT id, id AS community FROM"
        " (SELECT p1 AS id FROM eg UNION SELECT p2 FROM eg))",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
    , m{k} AS MATERIALIZED (
      SELECT u.src AS id, p.community AS community, COUNT(*) AS cnt
      FROM und u JOIN l{k - 1} p ON u.dst = p.id
      GROUP BY u.src, p.community
    ), b{k} AS MATERIALIZED (
      SELECT id, community AS new_c FROM (
        SELECT id, community,
               ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, community ASC) AS rn
        FROM m{k}) WHERE rn = 1
    ), l{k} AS MATERIALIZED (
      SELECT p.id, COALESCE(b.new_c, p.community) AS community
      FROM l{k - 1} p LEFT JOIN b{k} b ON b.id = p.id
    )""")
    parts.append(f"SELECT id, community FROM l{iters}")
    return "".join(parts)


@query("g49_label_propagation", oracle=_g49_oracle())
def g49_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the part co-purchase graph (same edge
    frame as g47's k-core): deterministic synchronous LPA, fixed 5
    rounds. The sweep is fully deterministic (argmax neighbor label,
    ties to the smallest label) over integer state, so — unlike the
    randomized-order LPA of the literature — a fixed-iteration unrolled
    CTE oracle pins it exactly (VERDICT r6 #4); golden-graph unit tests
    in test_graph_algos.py pin the operator besides."""
    from pymongraph_spark.operators.graph_algos import label_propagation

    t = load_tables(spark, sf_dir)
    co = _part_cooccurrence(t)
    verts = (
        co.select(F.col("src").alias("id"))
        .unionByName(co.select(F.col("dst").alias("id")))
        .distinct()
    )
    return label_propagation(verts, co, max_iter=5)


@query(
    "g50_scc_functional",
    # Mutual-reachability oracle: DuckDB computes the transitive closure
    # of the 25-node functional graph (i → (i²+1) mod 25 — NOT a
    # permutation, so the graph has tails feeding cycles: singleton SCCs
    # and cycle SCCs both occur) and labels each vertex with the min id
    # among itself and its mutually-reachable set — exactly the SCC
    # contract of the coloring algorithm.
    oracle="""
    WITH RECURSIVE
    n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
    e AS (
      SELECT CAST(n_nationkey AS BIGINT) AS src,
             CAST((n_nationkey * n_nationkey + 1) % 25 AS BIGINT) AS dst
      FROM nation
    ),
    reach(a, b) AS (
      SELECT src, dst FROM e
      UNION
      SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
    ),
    mutual AS (
      SELECT r1.a, r1.b FROM reach r1
      WHERE EXISTS (SELECT 1 FROM reach r2 WHERE r2.a = r1.b AND r2.b = r1.a)
    )
    SELECT n.id,
           CAST(LEAST(n.id, COALESCE(MIN(m.b), n.id)) AS BIGINT) AS component
    FROM n LEFT JOIN mutual m ON m.a = n.id
    GROUP BY n.id
    """,
)
def g50_scc_functional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (directed — the coloring/FW-BW
    method) on the functional graph i → (i²+1) mod 25 over nation keys:
    tails collapse to singleton SCCs, cycles to multi-node SCCs, and
    the min-id labels hash-match DuckDB's recursive-CTE
    mutual-reachability closure."""
    from pymongraph_spark.operators.graph_algos import strongly_connected_components

    n = load_tables(spark, sf_dir)["nation"]
    verts = n.select(F.col("n_nationkey").cast("long").alias("id"))
    edges = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((F.col("n_nationkey") * F.col("n_nationkey") + 1) % 25).cast("long").alias("dst"),
    )
    return strongly_connected_components(verts, edges)


# --------------------------------------------------------------------------
# Link prediction on the bipartite order—part graph: Jaccard similarity of
# order-neighborhoods for part pairs ("bought together" scoring). Distinct
# from g43 (triangles count a fixed projection; this ranks pairs by a
# normalized overlap). Plan: one self-join of the 'contains' edges on the
# shared order (equi-join on src — shuffle ONCE on the order key), count
# per pair, then two broadcast-sized degree joins; jaccard is a single
# bigint division → bit-exact across engines. At 100 TB the self-join is
# the standard bounded wedge expansion: per-order pair fan-out is capped
# by order size (TPC-H ≤ 7 lineitems), never corpus².
# --------------------------------------------------------------------------
@query(
    "g51_part_jaccard_pairs",
    oracle=ORACLE_GRAPH_CTE
    + """
    , ce AS (SELECT src, dst FROM e WHERE label = 'contains'),
    deg AS (SELECT dst AS part, COUNT(*) AS d FROM ce GROUP BY dst),
    shared AS (
      SELECT a.dst AS part_a, b.dst AS part_b, COUNT(*) AS n_shared
      FROM ce a JOIN ce b ON a.src = b.src AND a.dst < b.dst
      GROUP BY a.dst, b.dst
    )
    SELECT part_a, part_b, n_shared,
           CAST(n_shared AS DOUBLE) / (da.d + db.d - n_shared) AS jaccard
    FROM shared
      JOIN deg da ON da.part = part_a
      JOIN deg db ON db.part = part_b
    WHERE n_shared >= 2
    ORDER BY jaccard DESC, part_a, part_b
    LIMIT 20
    """,
)
def g51_part_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = tpch_graph(spark, sf_dir)
    ce = g.edges.filter(F.col("label") == "contains").select("src", "dst")
    deg = ce.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
    a, b = ce.alias("a"), ce.alias("b")
    shared = (
        a.join(b, (F.col("a.src") == F.col("b.src")) & (F.col("a.dst") < F.col("b.dst")))
        .groupBy(F.col("a.dst").alias("part_a"), F.col("b.dst").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    da = deg.select(F.col("dst").alias("part_a"), F.col("d").alias("da"))
    db = deg.select(F.col("dst").alias("part_b"), F.col("d").alias("db"))
    return (
        shared.join(F.broadcast(da), on="part_a")
        .join(F.broadcast(db), on="part_b")
        .select(
            "part_a",
            "part_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("da") + F.col("db") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "part_a", "part_b")
        .limit(20)
    )


# --------------------------------------------------------------------------
# PERSONALIZED PageRank, exact tier: restart mass (and the initial rank)
# sits only on the source vertex, so ranks measure proximity to it — the
# recommendation / trust-propagation form of PageRank. Same scaled-
# integer arithmetic and unrolled-CTE oracle as g48; only rows the walk
# can reach are non-zero (emitted WHERE rank > 0 to keep the output the
# source's neighborhood, not the whole graph).
# --------------------------------------------------------------------------
_G52_SOURCE = 4  # customer 1's vertex id


def _g52_oracle(iters: int = 4, scale: int = 10**9, source: int = _G52_SOURCE) -> str:
    base = 15 * scale // 100
    parts = [
        ORACLE_GRAPH_CTE,
        ", od AS (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY src)",
        f""", pr0 AS (
      SELECT id, CAST(CASE WHEN id = {source} THEN {scale} ELSE 0 END AS BIGINT) AS rank
      FROM v
    )""",
    ]
    for k in range(1, iters + 1):
        parts.append(f"""
    , pr{k} AS (
      SELECT v.id,
             CAST(CASE WHEN v.id = {source} THEN {base} ELSE 0 END
                  + (85 * COALESCE(c.inflow, 0)) // 100 AS BIGINT) AS rank
      FROM v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.rank // od.outdeg) AS inflow
        FROM pr{k - 1} p JOIN e ON p.id = e.src JOIN od ON od.id = e.src
        GROUP BY e.dst
      ) c ON v.id = c.id
    )""")
    parts.append(f"SELECT id, rank FROM pr{iters} WHERE rank > 0")
    return "".join(parts)


@query("g52_personalized_pagerank", oracle=_g52_oracle())
def g52_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import pagerank_exact

    g = tpch_graph(spark, sf_dir)
    ranks = pagerank_exact(
        g.vertices, g.edges, max_iter=4, scale=10**9, sources=[_G52_SOURCE]
    )
    return ranks.filter(F.col("rank") > 0)


# --------------------------------------------------------------------------
# Harmonic centrality of customer 1 within 3 undirected hops: Σ 1/d(v)
# over reached vertices — the centrality that handles disconnection
# gracefully (unreached contribute 0, no infinite distances). 1/3 is not
# dyadic, so the fold runs in sorted (distance, id) order in BOTH
# engines; counts per depth ride along. Distances come from the same
# frontier BFS g42 gates.
# --------------------------------------------------------------------------
@query(
    "g53_harmonic_centrality",
    oracle=ORACLE_GRAPH_CTE.replace("WITH", "WITH RECURSIVE", 1)
    + """
    , und AS (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ),
    bfs AS (
      SELECT CAST(4 AS BIGINT) AS id, 0 AS dist
      UNION
      SELECT und.dst AS id, bfs.dist + 1 AS dist
      FROM bfs JOIN und ON und.src = bfs.id
      WHERE bfs.dist < 3
    ),
    d AS (
      SELECT id, MIN(dist) AS dist FROM bfs GROUP BY id HAVING MIN(dist) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
           CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
           CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_d3,
           list_reduce(list_prepend(0.0, list(1.0 / dist ORDER BY dist, id)),
                       (a, b) -> a + b) AS harmonic
    FROM d
    """,
)
def g53_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongraph_spark.operators.graph_algos import bfs_distances

    g = tpch_graph(spark, sf_dir)
    d = bfs_distances(g.edges, source=4, max_depth=3, undirected=True).filter(
        F.col("distance") > 0
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum(F.when(F.col("distance") == 1, 1).otherwise(0)).cast("bigint").alias("n_d1"),
        F.sum(F.when(F.col("distance") == 2, 1).otherwise(0)).cast("bigint").alias("n_d2"),
        F.sum(F.when(F.col("distance") == 3, 1).otherwise(0)).cast("bigint").alias("n_d3"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("distance", "id"))),
            F.lit(0.0),
            lambda acc, x: acc + F.lit(1.0) / x["distance"].cast("double"),
        ).alias("harmonic"),
    )


# --------------------------------------------------------------------------
# CDC change feed over the versioned store (Delta CDF analogue): save v1,
# apply one round of writes (the g45 BUILDING cascade delete + a 3-row
# tag-vertex upsert), save v2, then diff the two snapshots with
# store.changes — anti-joins on the deterministic hash ids, never a
# prop-payload comparison. The oracle recomputes every count from the
# base tables: deletes are the cascade's footprint, inserts the upsert
# batch. At 100 TB this is how a downstream consumer tails the graph
# store incrementally instead of re-reading snapshots.
# --------------------------------------------------------------------------
@query(
    "g54_store_cdc",
    oracle=ORACLE_GRAPH_CTE
    + """
    , doomed AS (SELECT c_custkey*4 AS id FROM customer WHERE c_mktsegment = 'BUILDING'),
    rows_ AS (
      SELECT 'edge' AS entity, 'delete' AS op,
             (SELECT COUNT(*) FROM e WHERE src IN (SELECT id FROM doomed)
                                        OR dst IN (SELECT id FROM doomed)) AS n
      UNION ALL
      SELECT 'vertex', 'delete', (SELECT COUNT(*) FROM v WHERE id IN (SELECT id FROM doomed))
      UNION ALL
      SELECT 'vertex', 'insert', 3
    )
    -- store.changes().groupBy emits only observed groups; a generation
    -- with no BUILDING customers must not make the oracle fabricate
    -- zero-count rows the Spark side cannot produce
    SELECT entity, op, n FROM rows_ WHERE n > 0
    """,
)
def g54_store_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:

    from pymongraph_spark.graph import store

    g = tpch_graph(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    path = scratch_dir("g54_store", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store.save(g, path)
    v1 = store.versions(path)[-1]
    doomed = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        (F.col("c_custkey") * 4).alias("id")
    )
    tags = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "name: string"
    )
    g2 = upsert_vertices(
        delete_vertices(g, doomed),
        "tag",
        tags,
        key="name",
        registry={"tag": {"name"}},
    )
    store.save(g2, path)
    return (
        store.changes(spark, path, v1)
        .groupBy("entity", "op")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --------------------------------------------------------------------------
# Quality-bound rows for the rows-only approximations (VERDICT r10 item 3):
# each rows-only query is anchored by a hash-matched exact twin, but until
# now no driver row ASSERTED the approximate result is NEAR the exact one —
# a silent quality collapse would keep producing green rows-only rows.
# g56/g57 bind the graph tier; q92/d63/d64/s62/s63 bind the others.
# --------------------------------------------------------------------------
@query("g56_kcore_converged_exact", oracle=_g55_oracle(rounds=_G56_ROUNDS))
def g56_kcore_converged_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g47's quality bound, strongest form — full MEMBERSHIP hash-match:
    the CONVERGED peel (g47's exact call, max_iter=50) against a 32-round
    unrolled synchronous-peel oracle. Green iff the peel converges within
    32 rounds AND every surviving vertex matches DuckDB bit-for-bit;
    convergence depth measured 12-16 rounds across sf0.001-0.1, so 32 is
    2x margin — a peel that stops early, loops wrong, or drifts past 32
    rounds turns this row red (unlike g55's fixed-8-round state compare,
    which at sf0.01 is NOT yet the fixpoint: 940 vs 935 converged)."""
    from pymongraph_spark.operators.graph_algos import k_core

    t = load_tables(spark, sf_dir)
    co = _part_cooccurrence(t)
    return k_core(co, k=3, max_iter=50)


def _pagerank_int_replica(
    vertices: DataFrame, edges: DataFrame, iters: int, scale: int
) -> DataFrame:
    """Scaled-integer replica of pagerank()'s EXACT model (graph_algos
    .pagerank: damping 0.85, dangling mass redistributed, float) — unlike
    pagerank_exact/g48, which deliberately simplifies the model (no
    dangling term; measured mean |g38−g48/1e9| = 0.73 on the tpch graph,
    useless as a bound). All updates are int64 floor divisions, so the
    fixpoint is bit-deterministic; per-division floor loss < 1/scale
    bounds |float − int/scale| ≪ 1e-6 at scale 1e12 (g57's bound)."""
    v = vertices.select("id").distinct().localCheckpoint(eager=True)
    n = v.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("od")
    )
    links = (
        edges.select("src", "dst")
        .join(out_deg, F.col("src") == F.col("id"))
        .select("src", "dst", "od")
        .localCheckpoint(eager=True)
    )
    ranks = v.select("id", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        contribs = (
            links.join(ranks, links.src == ranks.id)
            .select("dst", F.expr("r div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        dang = (
            ranks.join(out_deg.select("id"), on="id", how="left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("ds"))
            .select(F.expr(f"ds div {n}").alias("ds"))
        )
        ranks = (
            v.join(contribs, v.id == contribs.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (
                    F.lit(15 * scale // 100)
                    + F.expr("(85 * (coalesce(inflow, 0) + ds)) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


@query(
    "g57_pagerank_float_bound",
    oracle=ORACLE_GRAPH_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           1 AS max_absdiff_within_1e_6,
           1 AS mean_absdiff_within_1e_7
    FROM v""",
)
def g57_pagerank_float_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g38's quality bound: the float power iteration (damping 0.85,
    5 iterations, dangling redistribution) against a scaled-integer
    replica of the SAME model at scale 1e12. The only divergence sources
    are float non-associativity (~1e-13 relative) and integer floor loss
    (<1e-12 per division, in-degree-summed ≪ 1e-6), so a green row means
    g38's float arithmetic tracks the bit-deterministic fixpoint to 1e-6
    — any model drift (lost dangling mass, wrong damping, iteration
    miscount) blows the bound by orders of magnitude. The flags are the
    only float-derived outputs; everything hashed is exact."""
    from pymongraph_spark.operators.graph_algos import pagerank

    g = tpch_graph(spark, sf_dir)
    pr = pagerank(g.vertices, g.edges, max_iter=5)
    ri = _pagerank_int_replica(g.vertices, g.edges, iters=5, scale=10**12)
    d = (
        pr.join(ri, "id")
        .select((F.abs(F.col("rank") - F.col("r") / F.lit(10.0**12))).alias("ad"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.max("ad").alias("mx"),
            F.avg("ad").alias("mn"),
        )
    )
    return d.select(
        F.col("n_vertices").cast("bigint"),
        (F.col("mx") <= F.lit(1e-6)).cast("int").alias("max_absdiff_within_1e_6"),
        (F.col("mn") <= F.lit(1e-7)).cast("int").alias("mean_absdiff_within_1e_7"),
    )
