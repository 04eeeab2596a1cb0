"""The drop-in façade, driven exactly the way reference code drives
MongoGraph/GraphImporter (method names, signatures, call sequences from
/root/reference usage patterns).
"""

from __future__ import annotations

import json

import pytest

from pymongraph_spark.compatibility import GraphImporter, MongoGraph


@pytest.fixture()
def mg(spark):
    return MongoGraph(spark=spark)


def test_reference_crud_sequence(mg):
    # the canonical reference flow: insert two vertices, connect, traverse
    d = mg.insert_vertex(label="domain", identify={"name": "evil.example"},
                         data={"name": "evil.example"})
    ip = mg.insert_vertex(label="ip", identify={"address": "1.2.3.4"},
                          data={"address": "1.2.3.4"})
    # duplicate insert returns the SAME id (mongraph.py:90-94)
    assert mg.insert_vertex("domain", {"name": "evil.example"},
                            {"name": "evil.example"}) == d

    eid = mg.insert_edge(d, ip)  # default label 'resolve' (mongraph.py:99)
    assert mg.insert_edge(d, ip) == eid  # triple dedup (mongraph.py:120-127)
    assert mg.insert_edge(ip, d) != eid  # direction matters

    nbrs, edges = mg.find_neighbors(d)
    assert nbrs == {d, ip}  # B7: self included
    assert len(edges) == 2

    verts, _ = mg.find_neighbors(d, get_details=True)
    assert {v["__type"] for v in verts} == {"domain", "ip"}

    out = json.loads(mg.build_graph(root_vertex=d, depth=2))
    assert len(out["graph"]["vertices"]) == 2

    # search by property (Q1) and by dict filter
    hits = mg.search_vertex({"name": "evil.example"})
    assert len(hits) == 1 and hits[0]["_id"] == d

    # U1 $set merge
    mg.update_vertex(d, {"rank": "9"})
    assert mg.search_vertex({"name": "evil.example"})[0]["rank"] == "9"

    # D1 cascade
    assert mg.delete_node(d) is True
    assert mg.search_vertex({"name": "evil.example"}) == []
    _, edges_after = mg.find_neighbors(ip)
    assert edges_after == []  # incident edges cascaded


def test_insert_node_and_owner_direction(mg):
    dom = mg.insert_vertex("domain", {"name": "x.example"}, {"name": "x.example"})
    src, eid, dst = mg.insert_node(dom, "owner", "belongTo",
                                   {"email": "a@x.example"},
                                   {"email": "a@x.example", "org": "X"})
    assert dst == dom
    _, edges = mg.find_neighbors(dom)
    (edge,) = edges
    assert edge["first_node"] == src and edge["second_node"] == dom  # owner→resource


def test_unknown_label_rejected(mg):
    from pymongraph_spark.graph.writes import UnknownLabelError

    with pytest.raises(UnknownLabelError):
        mg.insert_vertex("nope", {"k": "v"}, {"k": "v"})


def test_delete_by_filter_and_missing(mg):
    mg.insert_vertex("domain", {"name": "a.example"}, {"name": "a.example"})
    assert mg.delete_node(None, filter={"name": "a.example"}) is True
    assert mg.delete_node(None, filter={"name": "never.example"}) is False


def test_importer_facade(spark):
    gi = GraphImporter(spark=spark)
    gi.import_from_json({"bad.example": {
        "dns-resolutions": [{"ipaddress": "9.9.9.9", "domain": "bad.example",
                             "date": "2021-01-01"}],
        "detected-downloaded": [{"hash": "hh", "datetime": "t", "prob": "1/2"}],
    }})
    assert len(gi.search_vertex({"name": "bad.example"})) == 1
    assert len(gi.search_vertex({"address": "9.9.9.9"})) == 1
    root = gi.search_vertex({"name": "bad.example"})[0]
    assert root["detected_prop"] == "0.5"
    # importing again is a no-op (idempotent upsert)
    gi.import_from_json({"bad.example": {
        "dns-resolutions": [{"ipaddress": "9.9.9.9", "domain": "bad.example",
                             "date": "2021-01-01"}],
    }})
    out = json.loads(gi.build_graph(root_vertex=root["_id"], depth=3))
    assert len(out["graph"]["vertices"]) == 3  # domain, ip, detection


def test_insert_vertex_data_wins_over_identify(mg):
    # reference stores data's value when identify and data share a key
    # (mongraph.py:90-96: identify is a lookup filter, data is the document)
    vid = mg.insert_vertex("domain", identify={"name": "lookup.example"},
                           data={"name": "stored.example"})
    assert mg.search_vertex({"name": "stored.example"})[0]["_id"] == vid
    assert mg.search_vertex({"name": "lookup.example"}) == []
    # identify still supplies the key column's value when data lacks it
    vid2 = mg.insert_vertex("domain", identify={"alias": "only-id.example"},
                            data={"name": "real.example"})
    assert mg.search_vertex({"alias": "only-id.example"})[0]["_id"] == vid2


def test_change_collection_round_trip(spark):
    """B6 intent (mongraph.py:62-69): switch away, write elsewhere, switch
    back → the original collection's data is visible again; the other
    namespace keeps its own data independently."""
    mg = MongoGraph(spark)
    vid1 = mg.insert_vertex("domain", data={"name": "first.example"})
    mg.change_collection("other_vertices", "other_edges")
    assert mg.search_vertex({"name": "first.example"}) == []  # fresh namespace
    vid2 = mg.insert_vertex("domain", data={"name": "second.example"})
    mg.change_collection("vertices", "edge")
    found = mg.search_vertex({"name": "first.example"})
    assert [d["_id"] for d in found] == [vid1]
    assert mg.search_vertex({"name": "second.example"}) == []
    mg.change_collection("other_vertices", "other_edges")
    found2 = mg.search_vertex({"name": "second.example"})
    assert [d["_id"] for d in found2] == [vid2]


def test_insert_vertex_identify_lookup_returns_existing(mg):
    """Reference dedup (mongraph.py:90-94): when a vertex matching the
    FULL identify dict exists, insert_vertex returns its id and stores
    NOTHING — data must not spawn a second vertex."""
    vid = mg.insert_vertex("domain", {"name": "lookup.example"}, {"name": "lookup.example"})
    got = mg.insert_vertex("domain", identify={"name": "lookup.example"},
                           data={"name": "stored.example"})
    assert got == vid
    assert mg.search_vertex({"name": "stored.example"}) == []  # nothing stored


def test_empty_and_none_filters_match_anything(mg):
    """Reference find_one({})/delete_node(None) semantics: filter-less
    calls match everything (deterministic min-id first), never crash."""
    mg.insert_vertex("domain", {"name": "a.example"}, {"name": "a.example"})
    mg.insert_vertex("domain", {"name": "b.example"}, {"name": "b.example"})
    assert len(mg.search_vertex({})) == 2
    assert mg.delete_node(None) is True  # deletes the min-id vertex
    assert len(mg.search_vertex({})) == 1


def test_facade_reimport_refreshes_existing_vertex(spark):
    """The reference's primary workflow — incremental re-import — runs
    update_vertex against EXISTING vertices: a second report for the same
    resource must land its residual fields and recompute detected_prop,
    not be discarded by a whole-vertex anti-join."""
    from pymongraph_spark.compatibility import GraphImporter

    gi = GraphImporter(spark)
    gi.import_from_json({"bad.example": {
        "detected-downloaded": [{"hash": "h1", "datetime": "2020-01-01", "prob": "1/2"}],
    }})
    gi.import_from_json({"bad.example": {"ttl": 60}})
    doc = gi.search_vertex({"name": "bad.example"})[0]
    assert doc["ttl"] == "60"                     # second report's residual landed
    assert float(doc["detected_prop"]) == 0.0     # recomputed by the second visit


def test_facade_reimport_keeps_insert_origin_props(spark):
    """Reference insert_vertex on an EXISTING vertex is a no-op
    (mongraph.py:90-97): a re-imported detection vertex (same hash, new
    datetime/probability) and a re-imported whois owner vertex keep the
    FIRST import's insert-origin values; only update_vertex-origin props
    (detected_prop, residual fields) refresh."""
    from pymongraph_spark.compatibility import GraphImporter

    gi = GraphImporter(spark)
    gi.import_from_json({"bad.example": {
        "detected-downloaded": [{"hash": "h1", "datetime": "2020-01-01", "prob": "1/2"}],
        "whois": {"contacts": {"admin": {"email": "a@x.example", "org": "first-org"}}},
    }})
    gi.import_from_json({"bad.example": {
        "detected-downloaded": [{"hash": "h1", "datetime": "2024-09-09", "prob": "3/4"}],
        "whois": {"contacts": {"admin": {"email": "a@x.example", "org": "second-org"}}},
    }})
    det = gi.search_vertex({"hash": "h1"})[0]
    assert det["datetime"] == "2020-01-01"        # insert-origin: first import wins
    assert det["probability"] == "1/2"
    owner = gi.search_vertex({"email": "a@x.example"})[0]
    assert owner["org"] == "first-org"            # insert-origin: first import wins
    res = gi.search_vertex({"name": "bad.example"})[0]
    assert float(res["detected_prop"]) == 0.75    # update-origin: recomputed
