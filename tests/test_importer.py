"""Golden end-to-end ingest tests (SURVEY.md §5.2): fixture threat-intel
reports exercising every importer path — nested subdomains, dns-resolutions
in both directions, detections (incl. malformed prob → B8 intent), whois
owners, residual list/dict/scalar flattening, cross-report overlap, and
idempotency (import-twice ≡ import-once).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongraph_spark.ingest import import_from_json

REPORT_1 = {
    "evil.example": {
        "observed-subdomains": [
            {"domain": "a.evil.example"},
            # nested one-key report dict → recursion (graph_importer.py:77)
            {"domain": {"b.evil.example": {
                "dns-resolutions": [
                    {"ipaddress": "10.0.0.1", "domain": "b.evil.example", "date": "2020-01-02"}
                ],
            }}},
        ],
        "dns-resolutions": [
            {"ipaddress": "10.0.0.1", "domain": "evil.example", "date": "2020-01-01"},
        ],
        "detected-downloaded": [
            {"hash": "h-bad-1", "datetime": "2020-02-01", "prob": "30/60"},
            {"hash": "h-bad-2", "datetime": "2020-02-02", "prob": "garbage"},  # B8: skipped
        ],
        "undetected-downloaded": [
            {"hash": "h-ok-1", "datetime": "2020-02-03", "prob": "0/60"},
        ],
        "whois": {"contacts": {
            "admin": {"email": "admin@evil.example", "org": "EvilCorp"},
            "tech": None,
            "registrant": {"name": "no-email-here"},  # skipped: no email
        }},
        "categories": ["phishing", "malware"],     # residual list → F5
        "server": {"country": "XX"},               # residual dict → F6
        "asn": 65000,                              # residual scalar
    }
}

# Second report overlaps evil.example (re-insert + residual overwrite) and
# is an IP-rooted report (dns-resolutions go ip→domain).
REPORT_2 = {
    "10.0.0.1": {
        "dns-resolutions": [
            {"ipaddress": "10.0.0.1", "domain": "evil.example", "date": "2020-03-01"},
        ],
        "detected-communicating": [
            {"hash": "h-bad-1", "datetime": "2020-03-02", "prob": "10/20"},
        ],
    }
}

REPORT_3 = {  # re-observe evil.example with a residual overwrite
    "evil.example": {
        "asn": 65001,
        "detected-referrer": [
            {"hash": "h-bad-3", "datetime": "2020-04-01", "prob": "60/60"},
        ],
    }
}

ALL_REPORTS = [REPORT_1, REPORT_2, REPORT_3]


@pytest.fixture(scope="module")
def graph(spark):
    g = import_from_json(spark, ALL_REPORTS)
    return g.persist()


def _vmap(graph):
    return {
        (r["label"], (r["props"] or {}).get("name") or (r["props"] or {}).get("address")
         or (r["props"] or {}).get("hash") or (r["props"] or {}).get("email")): dict(r["props"] or {})
        for r in graph.vertices.collect()
    }


def test_vertex_inventory(graph):
    v = _vmap(graph)
    assert ("domain", "evil.example") in v
    assert ("domain", "a.evil.example") in v
    assert ("domain", "b.evil.example") in v
    assert ("ip", "10.0.0.1") in v
    assert ("malicious", "h-bad-1") in v
    assert ("malicious", "h-bad-2") in v
    assert ("malicious", "h-bad-3") in v
    assert ("legitimate", "h-ok-1") in v
    assert ("owner", "admin@evil.example") in v
    assert len(v) == 9


def test_detected_prop_last_report_wins(graph):
    v = _vmap(graph)
    # REPORT_1: ratios 30/60=0.5 (garbage skipped) and 0/60=0.0 → avg 0.25;
    # REPORT_3 then overwrites with 60/60=1.0 (last update wins).
    assert float(v[("domain", "evil.example")]["detected_prop"]) == 1.0
    # ip 10.0.0.1: REPORT_2 → 10/20 = 0.5
    assert float(v[("ip", "10.0.0.1")]["detected_prop"]) == 0.5
    # subdomain processed as nested dict with no detections → 0.0
    assert float(v[("domain", "b.evil.example")]["detected_prop"]) == 0.0
    # a.evil.example's child was a plain string → never processed → no prop
    assert "detected_prop" not in v[("domain", "a.evil.example")]


def test_residual_flattening_and_overwrite(graph):
    v = _vmap(graph)
    props = v[("domain", "evil.example")]
    assert props["categories_0"] == "phishing"
    assert props["categories_1"] == "malware"
    assert props["server_country"] == "XX"
    assert props["asn"] == "65001"  # REPORT_3 overwrote 65000


def test_detection_vertex_first_insert_wins(graph):
    v = _vmap(graph)
    # h-bad-1 inserted by REPORT_1 (datetime 2020-02-01); REPORT_2's
    # re-insert with 2020-03-02 must NOT overwrite (mongraph.py:90-97).
    assert v[("malicious", "h-bad-1")]["datetime"] == "2020-02-01"
    assert v[("malicious", "h-bad-1")]["probability"] == "30/60"


def test_owner_and_edges(graph, spark):
    v = _vmap(graph)
    assert v[("owner", "admin@evil.example")]["org"] == "EvilCorp"
    edges = [
        (r["label"], r["src"], r["dst"]) for r in graph.edges.collect()
    ]
    by_label = {}
    for lbl, s, d in edges:
        by_label.setdefault(lbl, 0)
        by_label[lbl] += 1
    # observed: evil→a, evil→b; assign: evil→ip, b→ip, ip→evil;
    # threat: evil→h-bad-1, evil→h-bad-2, ip→h-bad-1, evil→h-bad-3;
    # trusted: evil→h-ok-1; belongTo: owner→evil
    assert by_label == {
        "observed": 2, "assign": 3, "threat": 4, "trusted": 1, "belongTo": 1
    }
    assert graph.edges.count() == 11


def test_no_dangling_edges(graph):
    ids = graph.vertices.select("id")
    dangling = (
        graph.edges.join(ids.withColumnRenamed("id", "src"), on="src", how="left_anti")
        .unionByName(
            graph.edges.join(ids.withColumnRenamed("id", "dst"), on="dst", how="left_anti")
        )
    )
    assert dangling.count() == 0


def test_idempotency_import_twice(spark, graph):
    g2 = import_from_json(spark, ALL_REPORTS + ALL_REPORTS)
    assert g2.vertices.count() == graph.vertices.count()
    assert g2.edges.count() == graph.edges.count()
    # full content equality (order-insensitive)
    a = sorted(map(str, graph.vertices.select("id", "label", F.to_json("props")).collect()))
    b = sorted(map(str, g2.vertices.select("id", "label", F.to_json("props")).collect()))
    assert a == b


def test_flatten_indexed_null_empty_and_values(spark):
    # F5 direct contract: values → indexed map, [] → empty map, NULL → NULL
    # (the reference importer never writes the property for a missing list,
    # so NULL must propagate, not become an empty map)
    from pymongraph_spark.functions.scalars import flatten_indexed

    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", []), ("c", None)], "k string, vals array<string>"
    ).select("k", flatten_indexed("vals", F.col("vals")).alias("m"))
    out = {r["k"]: r["m"] for r in df.collect()}
    assert out["a"] == {"vals_0": "x", "vals_1": "y"}
    assert out["b"] == {}
    assert out["c"] is None


def test_empty_residual_collection_does_not_wipe_props(spark):
    """An empty residual list/dict is a no-op update (reference
    update_vertex({})), NOT a NULL props row — which would null the whole
    vertex fold via map_concat(acc, NULL)."""
    g = import_from_json(spark, [{"a.com": {"categories": [], "server": {}, "ttl": 5}}])
    rows = {dict(r["props"] or {}).get("name"): dict(r["props"] or {})
            for r in g.vertices.collect()}
    assert "a.com" in rows
    assert rows["a.com"]["name"] == "a.com"
    assert rows["a.com"]["ttl"] == "5"
    assert rows["a.com"]["detected_prop"] == "0.0"


def test_hostile_shapes_dead_letter_not_poison_pill(spark):
    """Valid-JSON-but-unexpected shapes (string body, scalar subdomain
    entries, string whois contact) must quarantine like parse failures —
    never fail the Spark job."""
    from pymongraph_spark.ingest.importer import corrupt_records, staging_frame

    reports = spark.createDataFrame(
        [
            (0, '{"a.com": "hello"}'),                                   # string body
            (1, '{"b.com": {"observed-subdomains": ["x"]}}'),            # scalar entry
            (2, '{"c.com": {"whois": {"contacts": {"admin": "email"}}}}'),  # string contact
            (3, '{"ok.com": {"ttl": 1}}'),                               # fine
            (4, 'not json at all'),                                      # parse failure
        ],
        "ord: bigint, value: string",
    )
    staging = staging_frame(spark, reports)
    bad = {r["ord"] for r in corrupt_records(staging).collect()}
    assert bad == {0, 1, 2, 4}
    g = import_from_json(spark, reports)
    names = {dict(r["props"] or {}).get("name") for r in g.vertices.collect()}
    assert "ok.com" in names  # the good record still lands


def test_detected_prop_last_visit_wins_and_residual_overrides(spark):
    """Reference ordering semantics (graph_importer.py:131-168): the
    computed detected_prop update runs per VISIT (a later visit of the
    same resource wins — no cross-visit averaging), and a literal
    'detected_prop' residual field is applied after the computed update
    within its visit, so it wins."""
    report = {
        "root.example": {
            "observed-subdomains": [
                # visit 1 of c.example: one parseable detection → 0.5
                {"domain": {"c.example": {
                    "detected-downloaded": [
                        {"hash": "h1", "datetime": "2020-01-01", "prob": "1/2"}
                    ],
                }}},
                # visit 2 of c.example: no detections → 0.0 (last wins)
                {"domain": {"c.example": {}}},
            ],
        }
    }
    g = import_from_json(spark, [report])
    props = {dict(r["props"] or {}).get("name"): dict(r["props"] or {})
             for r in g.vertices.collect()}
    assert float(props["c.example"]["detected_prop"]) == 0.0

    report2 = {
        "d.example": {
            "detected-downloaded": [
                {"hash": "h2", "datetime": "2020-01-01", "prob": "1/2"}
            ],
            "detected_prop": "0.99",  # residual literal beats the computed 0.5
        }
    }
    g2 = import_from_json(spark, [report2])
    props2 = {dict(r["props"] or {}).get("name"): dict(r["props"] or {})
              for r in g2.vertices.collect()}
    assert props2["d.example"]["detected_prop"] == "0.99"
