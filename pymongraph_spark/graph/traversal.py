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
    """
    f = F.broadcast(frontier.select("id").distinct())
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
    spark = g.vertices.sparkSession
    frontier = (
        vertex
        if isinstance(vertex, DataFrame)
        else spark.createDataFrame([(int(vertex),)], "id: long")
    )
    e = incident_edges(g, frontier)
    nbr_ids = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if get_details:
        return g.hydrate_vertices(nbr_ids), e
    return nbr_ids, e


def k_hop(
    g: PropertyGraph, roots, depth: int, checkpoint_every: int = 1
) -> tuple[DataFrame, DataFrame]:
    """G2 (_explode_node intent, mongraph.py:252-274): k-hop ego network.

    Frontier BFS with a visited anti-join (the reference has no visited
    set — worst-case exponential re-expansion; ours is O(depth) jobs).
    Returns (visited_vertex_ids, visited_edges). The root is included.
    """
    spark = g.vertices.sparkSession
    if isinstance(roots, DataFrame):
        frontier = roots.select("id").distinct()
    elif isinstance(roots, (list, tuple, set)):
        frontier = spark.createDataFrame([(int(r),) for r in roots], "id: long")
    else:
        frontier = spark.createDataFrame([(int(roots),)], "id: long")

    visited = frontier
    visited_edges = g.edges.limit(0)
    for level in range(depth):
        e = incident_edges(g, frontier)
        visited_edges = visited_edges.unionByName(e).dropDuplicates(["id"])
        endpoints = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        frontier = endpoints.join(visited, on="id", how="left_anti")
        visited = visited.unionByName(frontier).distinct()
        if (level + 1) % checkpoint_every == 0:
            # Truncate lineage: iterative unions otherwise build a plan of
            # depth O(k) that recomputes every prior level per action.
            frontier = frontier.localCheckpoint(eager=True)
            visited = visited.localCheckpoint(eager=True)
            visited_edges = visited_edges.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return visited, visited_edges


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
