"""Graph traversal: 1-hop neighbors, k-hop BFS, subgraph export
(SURVEY.md §2.7 G1-G3).

The reference expands one vertex per MongoDB round trip with no visited
set (mongraph.py:236-274 — and is latently broken, bugs B1-B3); we
implement the documented intent as frontier BFS over DataFrames:

    per level: frontier ⋈ edges → endpoints → anti-join visited → union

The undirected incident-edge $or query (mongraph.py:236-241) is executed
as a UNION of two equi-joins (src side + dst side) so both stay
hash-joinable instead of degrading to a nested-loop join. Each iteration
localCheckpoints to truncate lineage; small frontiers broadcast.

B7 semantics kept: find_neighbors includes the query vertex itself in the
returned vertex set (both endpoints of each incident edge are returned,
mongraph.py:243-245); the k-hop loop excludes already-visited vertices
from the next frontier to guarantee termination.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pymongraph_spark.graph.model import PropertyGraph, _as_predicate


def incident_edges(g: PropertyGraph, frontier: DataFrame) -> DataFrame:
    """All edges touching any frontier vertex (either direction).

    ``frontier``: DataFrame with column ``id``. The $or join is rewritten
    as union-of-equi-joins; dropDuplicates on edge id removes edges matched
    from both sides (e.g. self-loops or both endpoints in frontier).

    No forced broadcast: ego-network frontiers are tiny and AQE picks the
    broadcast semi-join from actual runtime sizes, but a hub-explosion
    frontier (the k_hop tier-3 promotion path) can exceed broadcast limits
    — a hint here would OOM exactly when the distributed tier matters.
    """
    f = frontier.select("id").distinct()
    by_src = g.edges.join(f.withColumnRenamed("id", "src"), on="src", how="left_semi")
    by_dst = g.edges.join(f.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
    return by_src.unionByName(by_dst).dropDuplicates(["id"])


def find_neighbors(
    g: PropertyGraph, vertex, get_details: bool = False
) -> tuple[DataFrame, DataFrame]:
    """G1 (mongraph.py:228-250): undirected 1-hop neighborhood.

    Returns (vertex_ids_or_details, incident_edges). Includes the query
    vertex itself (B7, kept as documented behavior). ``vertex`` is an id
    (int) or a DataFrame of ids.
    """
    if isinstance(vertex, DataFrame):
        e = incident_edges(g, vertex)
    else:
        # single-vertex case: one scan with a pushable predicate, no join
        v = int(vertex)
        e = g.edges.filter((F.col("src") == v) | (F.col("dst") == v))
    nbr_ids = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if get_details:
        return g.hydrate_vertices(nbr_ids), e
    return nbr_ids, e


def k_hop(
    g: PropertyGraph,
    roots,
    depth: int,
    small_frontier_threshold: int = 100_000,
    isin_literal_threshold: int = 1_000,
) -> tuple[DataFrame, DataFrame]:
    """G2 (_explode_node intent, mongraph.py:252-274): k-hop ego network.

    Frontier BFS with a visited set (the reference has none — worst-case
    exponential re-expansion; ours is O(depth) jobs). Returns
    (visited_vertex_ids, visited_edges). The root is included.

    Three-tier frontier strategy, chosen per level by frontier size:

    1. ≤ isin_literal_threshold ids — ONE scan of edges with an ``IN``
       filter pushed into the scan (no shuffle, no join). Capped at 1k
       because each id becomes a literal duplicated across the src and
       dst predicates, and tens of thousands of literals stress
       expression compilation long before driver memory matters.
    2. ≤ small_frontier_threshold ids — frontier stays a driver-side set
       (set algebra for visited/dedup is free), but expansion runs as a
       broadcast semi-join pair (incident_edges): the edge side is never
       shuffled and no literal expressions are built. This covers the
       entire ego-network regime; collecting ≤100k longs per level is
       single-digit MB on the driver.
    3. beyond — hub explosion: promote to the fully distributed plan
       (broadcast/shuffle semi-joins + anti-join visited + localCheckpoint
       lineage truncation), where frontier and visited live in DataFrames
       and nothing depends on driver memory. This is the 100 TB path;
       the driver tiers are latency optimizations for the common case.

    Edge dedup across levels is deferred to one final dropDuplicates.
    """
    spark = g.vertices.sparkSession

    # --- initialize in driver (fast) mode when roots are enumerable -----
    frontier_ids: list[int] | None
    if isinstance(roots, DataFrame):
        sample = roots.select("id").distinct().limit(small_frontier_threshold + 1).collect()
        frontier_ids = [r["id"] for r in sample] if len(sample) <= small_frontier_threshold else None
        frontier_df = roots.select("id").distinct()
    elif isinstance(roots, (list, tuple, set)):
        frontier_ids = [int(r) for r in roots]
        frontier_df = None
    else:
        frontier_ids = [int(roots)]
        frontier_df = None

    visited_ids: set[int] | None = set(frontier_ids) if frontier_ids is not None else None
    visited_df = frontier_df
    edge_levels: list[DataFrame] = []

    for _level in range(depth):
        if frontier_ids is not None:
            if not frontier_ids:
                break
            if len(frontier_ids) <= isin_literal_threshold:
                e = g.edges.filter(
                    F.col("src").isin(frontier_ids) | F.col("dst").isin(frontier_ids)
                )
            else:
                e = incident_edges(
                    g, spark.createDataFrame([(i,) for i in frontier_ids], "id: long")
                )
            e = e.localCheckpoint(eager=True)  # one scan; later actions reuse it
            edge_levels.append(e)
            endpoints = e.select("src", "dst").distinct().limit(
                small_frontier_threshold + 1
            ).collect()
            flat = {r["src"] for r in endpoints} | {r["dst"] for r in endpoints}
            # Promote on either bound: pair-count overflow means the limit
            # truncated the collect (flat is incomplete — must go
            # distributed), and id-count overflow means the next frontier
            # would exceed the documented driver cap even though the pair
            # list fit (a pair can contribute two fresh ids).
            if (
                len(endpoints) > small_frontier_threshold
                or len(flat) > small_frontier_threshold
            ):
                # hub explosion → promote driver state to DataFrames
                visited_df = spark.createDataFrame(
                    [(i,) for i in visited_ids], "id: long"
                )
                frontier_df = spark.createDataFrame(
                    [(i,) for i in frontier_ids], "id: long"
                )
                frontier_ids = visited_ids = None
                # re-run this level distributed
                e = incident_edges(g, frontier_df)
                edge_levels[-1] = e.localCheckpoint(eager=True)
                ep = (
                    e.select(F.col("src").alias("id"))
                    .unionByName(e.select(F.col("dst").alias("id")))
                    .distinct()
                )
                frontier_df = ep.join(visited_df, on="id", how="left_anti").localCheckpoint(eager=True)
                visited_df = visited_df.unionByName(frontier_df).distinct().localCheckpoint(eager=True)
                if frontier_df.isEmpty():
                    break
                continue
            new_frontier = flat - visited_ids
            visited_ids |= new_frontier
            frontier_ids = sorted(new_frontier)
        else:
            e = incident_edges(g, frontier_df)
            edge_levels.append(e.localCheckpoint(eager=True))
            endpoints_df = (
                e.select(F.col("src").alias("id"))
                .unionByName(e.select(F.col("dst").alias("id")))
                .distinct()
            )
            frontier_df = endpoints_df.join(visited_df, on="id", how="left_anti").localCheckpoint(eager=True)
            visited_df = visited_df.unionByName(frontier_df).distinct().localCheckpoint(eager=True)
            if frontier_df.isEmpty():
                break

    if visited_ids is not None:
        visited_df = spark.createDataFrame([(i,) for i in sorted(visited_ids)], "id: long")
    if edge_levels:
        visited_edges = edge_levels[0]
        for e in edge_levels[1:]:
            visited_edges = visited_edges.unionByName(e)
        visited_edges = visited_edges.dropDuplicates(["id"])
    else:
        visited_edges = g.edges.limit(0)
    return visited_df, visited_edges


def induced_subgraph(g: PropertyGraph, vertex_ids: DataFrame) -> PropertyGraph:
    """Edges whose BOTH endpoints are in the vertex set — double semi-join."""
    ids = vertex_ids.select("id").distinct()
    edges = (
        g.edges.join(ids.withColumnRenamed("id", "src"), on="src", how="left_semi")
        .join(ids.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
    )
    return PropertyGraph(g.hydrate_vertices(ids), edges)


def build_graph(g: PropertyGraph, root=None, predicate=None, depth: int = 4) -> str:
    """G3 (mongraph.py:276-303): resolve root (by id, or deterministic
    first predicate match — min id per SURVEY §5.5), expand to ``depth``
    ONCE (bug B2's intent), and export ``{"graph": {"vertices": [...],
    "edges": [...]}}`` as a JSON string with string ids and sorted lists
    (bug B4's intent: actually JSON-serializable).

    The collect is by design: the reference's contract returns one JSON
    payload. For at-scale export, write ``induced_subgraph(...)`` frames
    with df.write.json instead.
    """
    if root is None:
        matches = g.find_one(_as_predicate(predicate)).select("id").collect()
        if not matches:
            return json.dumps({"graph": {"vertices": [], "edges": []}})
        root = matches[0]["id"]
    visited, _ = k_hop(g, root, depth)
    sub = induced_subgraph(g, visited)
    vertices = [
        {"id": str(r["id"]), "label": r["label"], "props": dict(r["props"] or {})}
        for r in sub.vertices.collect()
    ]
    edges = [
        {
            "id": str(r["id"]),
            "src": str(r["src"]),
            "dst": str(r["dst"]),
            "label": r["label"],
            "props": dict(r["props"] or {}),
        }
        for r in sub.edges.collect()
    ]
    vertices.sort(key=lambda v: v["id"])
    edges.sort(key=lambda e: e["id"])
    return json.dumps({"graph": {"vertices": vertices, "edges": edges}}, sort_keys=True)
