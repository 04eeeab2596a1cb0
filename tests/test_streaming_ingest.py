"""Streaming ingest: foreachBatch upserts into the parquet store, replay
idempotency, and incremental arrival (SURVEY.md §2.11).
"""

from __future__ import annotations

import json

import pytest

from pymongraph_spark.graph import store
from pymongraph_spark.ingest import import_from_json
from pymongraph_spark.ingest.streaming import stream_import

from tests.test_importer import ALL_REPORTS, REPORT_1, REPORT_2, REPORT_3


def _write_reports(dirpath, name, reports):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in reports) + "\n")


def test_stream_matches_batch(spark, tmp_path):
    inp, st, ckpt = tmp_path / "in", str(tmp_path / "store"), str(tmp_path / "ckpt")
    _write_reports(inp, "batch1.jsonl", ALL_REPORTS)

    q = stream_import(spark, str(inp), st, ckpt)
    q.awaitTermination()

    g_stream = store.load(spark, st)
    g_batch = import_from_json(spark, ALL_REPORTS)
    assert g_stream.vertices.count() == g_batch.vertices.count() == 9
    assert g_stream.edges.count() == g_batch.edges.count() == 11


def test_incremental_arrival_and_replay_idempotency(spark, tmp_path):
    inp, st, ckpt = tmp_path / "in", str(tmp_path / "store"), str(tmp_path / "ckpt")
    _write_reports(inp, "batch1.jsonl", [REPORT_1])
    stream_import(spark, str(inp), st, ckpt).awaitTermination()
    g1 = store.load(spark, st)
    v1, e1 = g1.vertices.count(), g1.edges.count()

    # second file arrives: overlapping resources → upsert, no duplicates
    _write_reports(inp, "batch2.jsonl", [REPORT_2, REPORT_3])
    stream_import(spark, str(inp), st, ckpt).awaitTermination()
    g2 = store.load(spark, st)
    assert g2.vertices.count() == 9
    assert g2.edges.count() == 11
    assert g2.vertices.count() >= v1 and g2.edges.count() >= e1

    # replay the same data with a FRESH checkpoint (simulated reprocess):
    # idempotent upsert → same counts
    stream_import(spark, str(inp), st, str(tmp_path / "ckpt2")).awaitTermination()
    g3 = store.load(spark, st)
    assert g3.vertices.count() == 9
    assert g3.edges.count() == 11

    # residual overwrite across batches: REPORT_3's asn=65001 won
    props = {
        r["label"]: dict(r["props"] or {})
        for r in g3.vertices.filter("label = 'domain'").collect()
        if (r["props"] or {}).get("name") == "evil.example"
    }
    assert props["domain"]["asn"] == "65001"


def test_store_time_travel_and_retention(spark, tmp_path, monkeypatch):
    from pymongraph_spark.graph import store
    from pymongraph_spark.graph.model import PropertyGraph

    def mkgraph(n):
        v = spark.createDataFrame(
            [(i, "thing", None) for i in range(n)], "id: long, label: string, props: map<string,string>"
        )
        e = spark.createDataFrame(
            [(i, i, i + 1, "next", None) for i in range(n - 1)],
            "id: long, src: long, dst: long, label: string, props: map<string,string>",
        )
        return PropertyGraph(v, e)

    path = str(tmp_path / "g")
    store.save(mkgraph(3), path)
    v1 = store.versions(path)[-1]
    store.save(mkgraph(5), path)
    # old version still readable by explicit id (time travel)...
    assert store.load(spark, path, version=v1).vertices.count() == 3
    # ...current load sees the newest
    assert store.load(spark, path).vertices.count() == 5
    # retention is AGE-GATED (same grace policy as the warehouse caches):
    # a third save puts v1 beyond the keep count, but it was committed
    # seconds ago — a concurrent time-travel reader could still be on it
    # — so it must survive this pass...
    store.save(mkgraph(7), path)
    assert v1 in store.versions(path)
    assert store.load(spark, path, version=v1).vertices.count() == 3
    # ...and be collected once the grace window has lapsed
    monkeypatch.setenv("SPARKGRAPH_GC_GRACE_SECONDS", "0")
    store.save(mkgraph(9), path)
    assert v1 not in store.versions(path)
    assert len(store.versions(path)) == 2
    assert store.load(spark, path, version=v1) is None
    assert store.load(spark, path).vertices.count() == 9


def test_lakehouse_probe_and_merge_routing(spark, tmp_path):
    """The Delta probe must return a stable, honest answer either way, and
    merge_into must work through whichever path the probe selects (MERGE
    INTO when delta is installed, parquet version-swap otherwise)."""
    fmt = store.lakehouse_format(spark)
    assert fmt in (None, "delta")
    assert store.lakehouse_format(spark) == fmt  # memoized, not re-probed

    st = str(tmp_path / "store")
    g1 = import_from_json(spark, [REPORT_1])
    merged = store.merge_into(spark, st, g1)
    v1 = merged.vertices.count()
    # replay is idempotent through either storage backend
    merged2 = store.merge_into(spark, st, g1)
    assert merged2.vertices.count() == v1
    assert merged2.edges.count() == merged.edges.count()


def test_merge_into_output_readable_via_store_load(spark, tmp_path):
    """ADVICE r4: whichever backend merge_into routes through, the result
    must be readable back through store.load / store.versions — a
    streamed merge must never become invisible to the store readers."""
    st = str(tmp_path / "store_roundtrip")
    g1 = import_from_json(spark, [REPORT_1])
    merged = store.merge_into(spark, st, g1)
    loaded = store.load(spark, st)
    assert loaded is not None
    assert loaded.vertices.count() == merged.vertices.count()
    assert loaded.edges.count() == merged.edges.count()
    assert len(store.versions(st)) >= 1


def test_merge_into_auto_is_layout_sticky(spark, tmp_path):
    """A store created as parquet stays parquet under backend='auto' even
    if a delta runtime appears later — history must not go invisible."""
    st = str(tmp_path / "store_sticky")
    g1 = import_from_json(spark, [REPORT_1])
    store.merge_into(spark, st, g1, backend="parquet")
    # fake a session whose probe says delta: auto must still pick parquet
    # because the existing layout wins before the runtime probe runs
    memo = "_sparkgraph_lakehouse_format"
    had = hasattr(spark, memo)
    old = getattr(spark, memo, None)
    try:
        setattr(spark, memo, "delta")
        merged = store.merge_into(spark, st, g1, backend="auto")
    finally:
        # restore absence with delattr: setattr(..., None) would leave
        # the probed-already flag set and pin "no runtime" session-wide
        if had:
            setattr(spark, memo, old)
        else:
            delattr(spark, memo)
    assert not store._delta_layout(st)
    assert store.load(spark, st).vertices.count() == merged.vertices.count()


def test_merge_into_delta_backend_roundtrip(spark, tmp_path):
    """Delta-backend merge readable via the same store.load API. Skipped
    where the runtime is absent (this container ships no delta jars)."""
    import pytest

    if store.lakehouse_format(spark) != "delta":
        pytest.skip("delta runtime not installed")
    st = str(tmp_path / "store_delta")
    g1 = import_from_json(spark, [REPORT_1])
    merged = store.merge_into(spark, st, g1, backend="delta")
    loaded = store.load(spark, st)
    assert loaded is not None
    assert loaded.vertices.count() == merged.vertices.count()
    assert len(store.versions(st)) >= 1


def test_delta_versions_sort_numerically(tmp_path):
    """Regression: commit ids must sort numerically — lexicographic
    string order breaks at commit 10 ('10' < '2') and versions()[-1]
    (the 'just written' idiom) would point at the wrong snapshot."""
    log = tmp_path / "store" / "delta_vertices" / "_delta_log"
    log.mkdir(parents=True)
    for i in range(12):
        (log / f"{i:020d}.json").write_text("{}")
    got = store.versions(str(tmp_path / "store"))
    assert got == [str(i) for i in range(12)]
    assert got[-1] == "11"


def test_store_changes_cdc(spark, tmp_path):
    """store.changes: inserts/deletes keyed by id; identical snapshots
    diff to empty; a missing version fails loudly."""
    import pytest as _pytest

    from pymongraph_spark.graph import store
    from pymongraph_spark.graph.model import PropertyGraph

    def mkgraph(ids):
        v = spark.createDataFrame(
            [(i, "thing", None) for i in ids],
            "id: long, label: string, props: map<string,string>",
        )
        e = spark.createDataFrame(
            [(100 + a, a, b, "next", None) for a, b in zip(ids, ids[1:])],
            "id: long, src: long, dst: long, label: string, props: map<string,string>",
        )
        return PropertyGraph(v, e)

    path = str(tmp_path / "g")
    store.save(mkgraph([0, 1, 2]), path)          # edges 100, 101
    v1 = store.versions(path)[-1]
    store.save(mkgraph([1, 2, 3]), path)          # edges 101, 102
    rows = {
        (r.entity, r.op, r.id)
        for r in store.changes(spark, path, v1).collect()
    }
    assert rows == {
        ("vertex", "delete", 0),
        ("vertex", "insert", 3),
        ("edge", "delete", 100),
        ("edge", "insert", 102),
    }
    # same version against itself → empty feed
    assert store.changes(spark, path, v1, v1).count() == 0
    with _pytest.raises(ValueError):
        store.changes(spark, path, "no-such-version")
