"""Custom stateful streaming (applyInPandasWithState) and streaming dedup
(dropDuplicatesWithinWatermark): state survives across micro-batches and
stays bounded.
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest
from pyspark.sql import functions as F

from pymongraph_spark.streaming import deduped_event_stream, running_user_stats

from tests.conftest import SF_SMALL

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, value double"


def _write_batch(spark, tmp_path, src, fname, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    stage = tmp_path / "stage" / fname
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    src.mkdir(parents=True, exist_ok=True)
    shutil.copy(part, str(src / f"{fname}.parquet"))


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    _write_batch(spark, tmp_path, src, "b1",
                 [(1, T0, 10, 5.0), (2, T0, 10, 7.0), (3, T0, 20, 1.0)])

    def run():
        stream = (
            spark.readStream.schema(SCHEMA).parquet(str(src))
            .withWatermark("ts", "1 hour")
        )

        # update-mode state output needs foreachBatch (file sinks are
        # append-only); each micro-batch's updates append to the log
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            running_user_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run()
    # batch 2 arrives later: user 10's state must CARRY OVER (n=3 total)
    _write_batch(spark, tmp_path, src, "b2",
                 [(4, T0 + dt.timedelta(minutes=5), 10, 3.0)])
    run()

    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:  # append sink keeps every update; take max n per user
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            latest[r["user_id"]] = r
    assert latest[10]["n_events"] == 3
    assert latest[10]["total_value"] == pytest.approx(15.0)
    assert latest[10]["max_value"] == pytest.approx(7.0)
    assert latest[20]["n_events"] == 1


def test_stateful_all_null_group_emits_nulls(spark, tmp_path):
    """A group whose values are all NULL must emit NULL total/max (SQL
    SUM/MAX over no non-null values), never 0.0/-inf — the latent gate
    divergence the r6 advice flagged (stateful.py has_values guard)."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    _write_batch(spark, tmp_path, src, "b1",
                 [(1, T0, 30, None), (2, T0, 30, None), (3, T0, 40, 2.5)])

    stream = (
        spark.readStream.schema(SCHEMA).parquet(str(src))
        .withWatermark("ts", "1 hour")
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r for r in spark.read.parquet(out).collect()}
    assert got[30]["n_events"] == 2
    assert got[30]["total_value"] is None
    assert got[30]["max_value"] is None
    assert got[40]["total_value"] == pytest.approx(2.5)
    assert got[40]["max_value"] == pytest.approx(2.5)


def test_tws_classic_all_null_group_emits_nulls(spark, tmp_path):
    """Same NULL-group contract for the tws classic fallback (min too)."""
    from pymongraph_spark.streaming.tws import running_type_stats_classic

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    tschema = "event_type string, ts timestamp, value double"
    df = spark.createDataFrame([("a", T0, None), ("b", T0, 4.0)], tschema)
    stage = tmp_path / "stage" / "b1"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    src.mkdir(parents=True, exist_ok=True)
    shutil.copy(part, str(src / "b1.parquet"))

    stream = (
        spark.readStream.schema(tschema).parquet(str(src))
        .select("event_type", "value")
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        running_type_stats_classic(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r["event_type"]: r for r in spark.read.parquet(out).collect()}
    assert got["a"]["n_events"] == 1
    assert got["a"]["total_value"] is None
    assert got["a"]["min_value"] is None
    assert got["a"]["max_value"] is None
    assert got["b"]["min_value"] == pytest.approx(4.0)


def test_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    # duplicate event_id 1 inside the same watermark horizon
    _write_batch(spark, tmp_path, src, "b1",
                 [(1, T0, 10, 5.0), (1, T0 + dt.timedelta(seconds=30), 10, 5.0),
                  (2, T0, 20, 1.0)])

    stream = (
        spark.readStream.schema(SCHEMA).parquet(str(src))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        deduped_event_stream(stream, keys=["event_id"])
        .writeStream.format("parquet").option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2]  # the duplicate collapsed


def test_tws_probe_and_classic_equivalence(spark, sf_small):
    """transformWithStateInPandas requires protobuf; the probe must gate
    it honestly, and the classic-API fallback must produce the batch
    aggregate exactly (the route the st89 oracle checks either way)."""
    from pymongraph_spark.streaming.tws import running_type_stats_tws, tws_available

    if not tws_available():
        # the new API must fail loudly, not hang or silently fall back
        import pytest as _pytest

        from pymongraph_spark.queries.streaming import _events_stream

        stream = _events_stream(spark, sf_small).select("event_type", "value")
        with _pytest.raises(Exception):
            q = (
                running_type_stats_tws(stream)
                .writeStream.format("memory").queryName("tws_probe_fail")
                .outputMode("update").trigger(availableNow=True).start()
            )
            q.awaitTermination()


def test_st91_replayed_batch_is_idempotent(spark, tmp_path):
    """ADVICE r10: an at-least-once REPLAY of an st91 micro-batch must not
    emit same-wave or identity pairs (the replayed batch would otherwise
    probe an index already containing its own rows — l2sq=0 survivors
    that distinct() cannot remove). Simulated for real: run the stream,
    delete the final batch's checkpoint COMMIT (offsets stay), restart —
    Structured Streaming replays that batch; the batch-id-keyed sinks
    must absorb it bit-identically."""
    import os

    from pymongraph_spark.queries.streaming import _st91_run

    base = str(tmp_path / "st91")
    sf = SF_SMALL
    first = sorted(map(tuple, _st91_run(spark, sf, base).collect()))

    commits = os.path.join(base, "ckpt", "commits")
    last = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")  # local checksum-FS shadow
    if os.path.exists(crc):
        os.unlink(crc)

    replayed = sorted(map(tuple, _st91_run(spark, sf, base).collect()))
    assert replayed == first
    for a, b, l2 in replayed:
        assert a != b and a % 4 > b % 4  # cross-wave orientation intact


def test_st94_compaction_preserves_pairs_and_bounds_layout(spark, tmp_path):
    """The generation-fold only RELOCATES index rows, so st94 (compacted)
    must emit exactly st92's pairs; and after the run the per-batch tier
    is bounded by compact_every while a single committed generation
    covers the rest — the layout claim behind 'flat at any trigger
    count'."""
    import os

    from pymongraph_spark.queries import QUERIES
    from pymongraph_spark.queries.streaming import _st92_run

    want = sorted(
        map(
            tuple,
            QUERIES["st92_streaming_embedding_neardup_hier"](spark, SF_SMALL).collect(),
        )
    )
    base = str(tmp_path / "st94")
    got = sorted(map(tuple, _st92_run(spark, SF_SMALL, base, compact_every=2).collect()))
    assert got == want and len(got) > 0

    gens = [
        d for d in os.listdir(os.path.join(base, "gen")) if d.startswith("r=")
    ]
    # binary-counter tier: generations ≤ log2(minors)+1 — at 4 waves /
    # compact_every=2 the two equal-size minors fold into one
    assert 1 <= len(gens) <= 2, f"generation tier out of bounds: {gens}"
    live = [
        d
        for d in os.listdir(os.path.join(base, "index"))
        if d.startswith("b=")
    ]
    assert len(live) < 2, f"per-batch tier not folded: {live}"


def test_st94_replay_after_compaction_is_idempotent(spark, tmp_path):
    """The st91 replay battery under compaction: delete the final batch's
    checkpoint COMMIT and restart — the replayed batch's rows are already
    inside a generation file, so the covered-generation skip (and the
    b < batch_id prune on the generation's b column) must absorb the
    replay bit-identically."""
    import os

    from pymongraph_spark.queries.streaming import _st92_run

    base = str(tmp_path / "st94r")
    first = sorted(
        map(tuple, _st92_run(spark, SF_SMALL, base, compact_every=2).collect())
    )

    commits = os.path.join(base, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    replayed = sorted(
        map(tuple, _st92_run(spark, SF_SMALL, base, compact_every=2).collect())
    )
    assert replayed == first
    for a, b, l2 in replayed:
        assert a != b and a % 4 > b % 4  # cross-wave orientation intact


def test_st94_major_fold_preserves_pairs(spark, tmp_path):
    """12 waves at compact_every=2 force minors at b=1,3,5,... and
    binary-counter majors whenever two adjacent generations reach
    near-equal size. Pairs must equal the uncompacted run's,
    generations must stay within the log₂ bound, and the majors must
    have actually happened (some generation spans more than one
    minor's range)."""
    import os

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.queries.streaming import _ST91_T, _make_hier_assign, _stream_neardup_run

    emb = load_tables(spark, SF_SMALL)["embeddings"].select("vec_id", "embedding")
    want = sorted(
        map(
            tuple,
            _stream_neardup_run(
                spark, emb, str(tmp_path / "flat"), _ST91_T, _make_hier_assign, waves=12
            ).collect(),
        )
    )
    base = str(tmp_path / "tiered")
    got = sorted(
        map(
            tuple,
            _stream_neardup_run(
                spark, emb, base, _ST91_T, _make_hier_assign, waves=12, compact_every=2
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    gens = [d for d in os.listdir(os.path.join(base, "gen")) if d.startswith("r=")]
    assert 1 <= len(gens) <= 4, gens
    spans = [tuple(int(x) for x in g[2:].split("_")) for g in gens]
    assert any(hi - lo >= 3 for lo, hi in spans), f"no major fold ran: {spans}"
    # layout discipline (round 14): majors are cell-clustered at write —
    # every data file of every major generation is sorted by cell, so
    # footer min/max stats prune a one-cell family scan (the measured
    # 1.87%-of-row-groups claim in SCALE_PROBE_cell_pruning.json rests
    # on this property; pin it so a refactor can't silently drop it)
    import pyarrow.parquet as pq

    major = max(gens, key=lambda g: spans[gens.index(g)][1] - spans[gens.index(g)][0])
    gdir = os.path.join(base, "gen", major)
    checked = 0
    for f in os.listdir(gdir):
        if not f.endswith(".parquet"):
            continue
        cells = pq.read_table(os.path.join(gdir, f), columns=["cell"])[
            "cell"
        ].to_pylist()
        assert cells == sorted(cells), f"{major}/{f} not cell-sorted"
        checked += 1
    assert checked > 0


def test_refresh_rejects_typo_strings(spark, tmp_path):
    """ADVICE r13 low: refresh='ocupancy' (typo) used to pass the
    isinstance check and silently run the occupancy rule. Only the
    literal 'occupancy' or a non-bool int may pass, and the rejection
    must fire BEFORE the stream starts."""
    import pytest

    from pymongraph_spark.catalog import load_tables
    from pymongraph_spark.queries.streaming import (
        _ST91_T,
        _make_hier_assign,
        _stream_neardup_run,
    )

    emb = load_tables(spark, SF_SMALL)["embeddings"].select("vec_id", "embedding")
    for bad in ("ocupancy", "OCCUPANCY", True, False):
        with pytest.raises(ValueError, match="refresh must be"):
            _stream_neardup_run(
                spark, emb, str(tmp_path / "x"), _ST91_T, _make_hier_assign,
                refresh=bad,
            )
        assert not (tmp_path / "x" / "ckpt").exists()  # nothing started


def test_occupancy_monitor_columns_and_refresh_rule(spark, tmp_path):
    """The codebook drift monitor (VERDICT r11 item 5): per-trigger rows
    carry the standing-index occupancy including the arriving batch, and
    needs_refresh fires exactly when max occupancy exceeds 4× the design
    target — pinned by re-deriving the flag from the emitted columns and
    by a deliberately tiny target that must trip it."""
    from pymongraph_spark.queries.streaming import _st92_run

    mon: list[dict] = []
    _st92_run(spark, SF_SMALL, str(tmp_path / "occ"), occupancy=mon).collect()
    trig = [r for r in mon if "end_state" not in r]
    assert len(trig) == 4  # one row per wave
    prev_rows = 0
    for row in trig:
        assert set(row) == {
            "batch_id",
            "n_cells",
            "index_rows",
            "mean_occupancy",
            "max_occupancy",
            "needs_refresh",
        }
        assert row["index_rows"] > prev_rows  # cumulative, batch included
        prev_rows = row["index_rows"]
        assert 1 <= row["mean_occupancy"] <= row["max_occupancy"]
        assert row["needs_refresh"] == (row["max_occupancy"] > 4 * 125)
    # plus exactly one post-drain end-state row (the steady-state reading
    # the occupancy claims are about — per-trigger rows read BEFORE that
    # trigger's refresh action)
    assert mon[-1].get("end_state") is True and len(mon) == 5
    assert mon[-1]["index_rows"] == trig[-1]["index_rows"]

    # an undersized codebook (tiny design target) must trip the flag
    mon2: list[dict] = []
    _st92_run(
        spark,
        SF_SMALL,
        str(tmp_path / "occ2"),
        occupancy=mon2,
        occupancy_target=1,
    ).collect()
    assert [r for r in mon2 if "end_state" not in r][-1]["needs_refresh"] is True


def test_st93_stream_equals_batch(spark):
    """The streaming PII scrub must emit EXACTLY the batch projection —
    same rows, same masked md5s — because batches partition the corpus
    and redaction is per-doc deterministic. Any drift (a batch skipped,
    a doc double-emitted, a different code path) breaks equality."""
    from pymongraph_spark.queries import QUERIES

    stream = QUERIES["st93_streaming_pii_scrub"](spark, SF_SMALL)
    batch = QUERIES["t105_pii_redaction"](spark, SF_SMALL)
    assert stream.count() == batch.count()
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


def test_st95_stream_equals_batch(spark):
    """The on-ingest tokenizer must emit EXACTLY the batch projection
    (t106) — same rows, same token counts — because batches partition
    the corpus and the frozen-vocab encode is per-doc deterministic."""
    from pymongraph_spark.queries import QUERIES

    stream = QUERIES["st95_streaming_bpe_encode"](spark, SF_SMALL)
    batch = QUERIES["t106_bpe_encode_frozen"](spark, SF_SMALL)
    assert stream.count() == batch.count()
    assert stream.exceptAll(batch).count() == 0
    assert batch.exceptAll(stream).count() == 0


# --------------------------------------------------------------------------
# st96: the monitor→retrain loop (VERDICT r12 item 1)
# --------------------------------------------------------------------------
def test_st96_replay_after_retrain_is_idempotent(spark, tmp_path):
    """Delete the final checkpoint commit and restart: the restart must
    REBUILD the committed epoch's codebook (deterministic retrain over
    the re-keyed rows) and replay the post-retrain trigger
    bit-identically."""
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    base = str(tmp_path / "st96r")
    first = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    assert first, "st96 emitted no pairs"
    assert os.path.exists(os.path.join(base, "retrain", "j=2.json"))

    commits = os.path.join(base, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    replayed = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    assert replayed == first


def test_st96_crash_before_marker_refires_retrain(spark, tmp_path, monkeypatch):
    """The crash window between the re= generation's _SUCCESS and the
    epoch marker: the unmarked generation must stay INVISIBLE to the
    read path, and the replayed fire must deterministically rewrite it
    — simulated by making the marker's os.replace raise once."""
    import os

    from pymongraph_spark.queries import streaming as st_mod
    from pymongraph_spark.queries.streaming import _st96_run

    ref = sorted(
        map(tuple, _st96_run(spark, SF_SMALL, str(tmp_path / "ref")).collect())
    )

    base = str(tmp_path / "st96c")
    real_replace = os.replace

    def boom(src, dst):
        if os.sep + "retrain" + os.sep in dst:
            raise OSError("injected crash before epoch marker")
        return real_replace(src, dst)

    monkeypatch.setattr(st_mod.os, "replace", boom)
    with pytest.raises(Exception):
        _st96_run(spark, SF_SMALL, base).collect()
    monkeypatch.setattr(st_mod.os, "replace", real_replace)

    # crash state: re= generation committed but unmarked, b-subdirs intact
    gen = os.path.join(base, "gen", "re=0_2")
    assert os.path.exists(os.path.join(gen, "_SUCCESS"))
    assert not os.path.exists(os.path.join(base, "retrain", "j=2.json"))
    assert os.path.exists(os.path.join(base, "index", "b=2", "_SUCCESS"))

    recovered = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    assert recovered == ref
    assert os.path.exists(os.path.join(base, "retrain", "j=2.json"))


def test_codebook_payload_roundtrip():
    """The persisted epoch-codebook artifact (VERDICT r13 item 7) is a
    canonical JSON of int64 grid coordinates: the round-trip must be
    exact and the serialization deterministic (it is checksummed)."""
    import numpy as np

    from pymongraph_spark.queries.streaming import (
        _codebook_from_payload,
        _codebook_payload,
    )

    cells = np.array([3, 7], dtype=np.int64)
    cmat = np.array([[1, -2, 3], [4, 5, -6]], dtype=np.int64)
    fine = {
        3: (np.array([0, 1], dtype=np.int64),
            np.array([[9, 8, 7], [6, 5, 4]], dtype=np.int64)),
        7: (np.array([2], dtype=np.int64),
            np.array([[-1, 0, 1]], dtype=np.int64)),
    }
    text = _codebook_payload(cells, cmat, fine)
    assert text == _codebook_payload(*_codebook_from_payload(text))
    c2, m2, f2 = _codebook_from_payload(text)
    assert (c2 == cells).all() and (m2 == cmat).all()
    assert set(f2) == {3, 7}
    assert (f2[3][1] == fine[3][1]).all() and (f2[7][0] == fine[7][0]).all()


def test_st96_restart_loads_codebook_without_kmeans(spark, tmp_path, monkeypatch):
    """VERDICT r13 item 7: a clean restart into a committed epoch must
    LOAD the persisted codebook artifact (checksummed against the
    marker) instead of re-running the O(index) kmeans. Job-count
    assertion: hierarchical_codebook — the retrain trainer — must not
    be called at all on the replay (the wave-0 pretrain uses the flat
    grid_kmeans path, so a zero count isolates the retrain rebuild)."""
    import hashlib
    import json
    import os

    from pymongraph_spark.operators import dedup as dedup_mod
    from pymongraph_spark.queries.streaming import _st96_run

    base = str(tmp_path / "st96a")
    first = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    assert first, "st96 emitted no pairs"
    marker_path = os.path.join(base, "retrain", "j=2.json")
    cb_path = os.path.join(base, "retrain", "cb=2.json")
    with open(marker_path) as fh:
        marker = json.load(fh)
    with open(cb_path) as fh:
        cb_text = fh.read()
    assert (
        marker["codebook_sha"]
        == hashlib.sha256(cb_text.encode("utf-8")).hexdigest()
    )

    commits = os.path.join(base, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)

    calls = []
    real = dedup_mod.hierarchical_codebook
    monkeypatch.setattr(
        dedup_mod,
        "hierarchical_codebook",
        lambda *a, **kw: calls.append(1) or real(*a, **kw),
    )
    replayed = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    assert replayed == first
    assert calls == [], "clean restart re-ran the kmeans retrain"


def test_st96_corrupt_or_missing_artifact_rebuilds_bitexact(
    spark, tmp_path, monkeypatch
):
    """The fallback half of VERDICT r13 item 7: a checksum-mismatched or
    missing artifact must fall back to the deterministic re-train and
    reproduce the replay bit-identically (one kmeans call, pairs equal)."""
    import os

    from pymongraph_spark.operators import dedup as dedup_mod
    from pymongraph_spark.queries.streaming import _st96_run

    def drop_last_commit(base):
        commits = os.path.join(base, "ckpt", "commits")
        last = max(
            (f for f in os.listdir(commits) if not f.startswith(".")), key=int
        )
        os.unlink(os.path.join(commits, last))
        crc = os.path.join(commits, f".{last}.crc")
        if os.path.exists(crc):
            os.unlink(crc)

    calls = []
    real = dedup_mod.hierarchical_codebook
    monkeypatch.setattr(
        dedup_mod,
        "hierarchical_codebook",
        lambda *a, **kw: calls.append(1) or real(*a, **kw),
    )

    # corrupt artifact: flip content so the sha in the marker mismatches
    base = str(tmp_path / "corrupt")
    first = sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect()))
    cb_path = os.path.join(base, "retrain", "cb=2.json")
    with open(cb_path) as fh:
        text = fh.read()
    with open(cb_path, "w") as fh:
        fh.write(text.replace('"cells":[', '"cells":[999,', 1))
    drop_last_commit(base)
    calls.clear()
    assert sorted(map(tuple, _st96_run(spark, SF_SMALL, base).collect())) == first
    assert calls == [1], "mismatch fallback must re-train exactly once"

    # missing artifact (pre-item-7 epoch layout): same fallback
    base2 = str(tmp_path / "missing")
    first2 = sorted(map(tuple, _st96_run(spark, SF_SMALL, base2).collect()))
    os.unlink(os.path.join(base2, "retrain", "cb=2.json"))
    drop_last_commit(base2)
    calls.clear()
    assert (
        sorted(map(tuple, _st96_run(spark, SF_SMALL, base2).collect())) == first2
    )
    assert 1 in calls, "missing-artifact fallback must re-train"


def test_retrain_prefix_pairs_identical(spark, tmp_path):
    """Unit pin for the probe's prefix-equality field (VERDICT r13
    item 3): pairs emitted BEFORE the retrain fire must be identical to
    a never-firing run's — the codebook is the same until the fire, and
    each trigger's pairs are written before its refresh evaluation, so
    the b ≤ fire_at prefix is codebook-invariant."""
    import os

    from pymongraph_spark.queries.streaming import _ST96_FIRE_AT, _st96_run

    def prefix_pairs(base):
        return sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(base, "pairs"))
                .filter(f"b <= {_ST96_FIRE_AT}")
                .select("b", "vec_id_new", "vec_id_corpus", "l2sq")
                .collect(),
            )
        )

    fired = str(tmp_path / "fired")
    never = str(tmp_path / "never")
    _st96_run(spark, SF_SMALL, fired).collect()  # fires at trigger 2
    _st96_run(spark, SF_SMALL, never, refresh=999).collect()  # never fires
    got, want = prefix_pairs(fired), prefix_pairs(never)
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# hot-cell-targeted refresh (VERDICT r13 item 5)
# --------------------------------------------------------------------------
def test_hot_cell_split_when_growth_gate_blocks(spark, tmp_path):
    """With occupancy_target=2 on 4 waves the rule fires globally at
    triggers 0/1/3 but is hysteresis-blocked at trigger 2 (375 < 2x250)
    while a cell is hot — the targeted path must split exactly that
    cell, and the trigger-3 global retrain must supersede the patch
    (markers swept, index fully re-keyed to non-negative epoch cells)."""
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    base = str(tmp_path / "split")
    log: list[dict] = []
    pairs = _st96_run(
        spark, SF_SMALL, base,
        refresh="occupancy", occupancy_target=2, refresh_log=log,
    ).collect()
    assert len(pairs) > 0
    kinds = [("split" if "split_cell" in r else "retrain") for r in log]
    assert kinds == ["retrain", "retrain", "split", "retrain"], log
    split = next(r for r in log if "split_cell" in r)
    assert split["k_split"] >= 2 and split["family_rows"] > 0
    retrain_files = os.listdir(os.path.join(base, "retrain"))
    assert not [f for f in retrain_files if f.startswith("p=")], retrain_files
    assert not [
        d for d in os.listdir(os.path.join(base, "gen")) if d.startswith("p=")
    ]
    final = spark.read.parquet(os.path.join(base, "gen", "re=0_3"))
    assert final.select("vec_id").distinct().count() == final.count() == 500
    assert final.filter("cell < 0").count() == 0  # epoch re-key cleared subs


def test_hot_cell_split_persists_and_replays(spark, tmp_path):
    """3 waves end right after the blocked-trigger split: the patch
    must be durably committed (marker + overlay), the standing index
    must present every row exactly once with the family re-keyed to
    sub-cells, a restart must reload the patch and replay the last
    trigger bit-identically, and — since the split fired AFTER the
    final trigger's data work — the pair set must equal the
    split_hot=False twin's exactly."""
    import json
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    base = str(tmp_path / "live")
    log: list[dict] = []
    first = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, base, waves=3,
                refresh="occupancy", occupancy_target=2, refresh_log=log,
            ).collect(),
        )
    )
    assert [("split" if "split_cell" in r else "retrain") for r in log] == [
        "retrain", "retrain", "split",
    ], log
    c = next(r["split_cell"] for r in log if "split_cell" in r)
    marker_path = os.path.join(base, "retrain", f"p={c}.json")
    with open(marker_path) as fh:
        m = json.load(fh)
    assert m["epoch"] == 1 and m["hi"] == 2 and m["k"] >= 2
    overlay = os.path.join(base, "gen", f"p={c}_2")
    assert os.path.exists(os.path.join(overlay, "_SUCCESS"))
    ov = spark.read.parquet(overlay)
    assert ov.count() == m["rows"] and ov.filter("cell >= 0").count() == 0
    assert ov.filter(
        f"CAST(floor((-cell - 1) / 64) AS BIGINT) != {c}"
    ).count() == 0  # every sub-cell maps back to the split base

    twin = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, str(tmp_path / "twin"), waves=3,
                refresh="occupancy", occupancy_target=2, split_hot=False,
            ).collect(),
        )
    )
    assert first == twin and len(first) > 0

    commits = os.path.join(base, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    replayed = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, base, waves=3,
                refresh="occupancy", occupancy_target=2,
            ).collect(),
        )
    )
    assert replayed == first


def test_hot_cell_split_composes_with_compaction(spark, tmp_path):
    """Split + compact_every together: minors fold the b-subdirs
    (including superseded family rows — excluded at read, carried in
    the fold), the overlay stays outside the binary-counter roster, and
    pairs equal the uncompacted split run's."""
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    # waves=7, target=2: global fires at 0/1/3, blocked splits after —
    # the run ENDS with a live overlay, and the post-retrain b-subdirs
    # (4,5) fold into a minor at trigger 5, so overlay reads compose
    # with both generation kinds
    kw = dict(waves=7, refresh="occupancy", occupancy_target=2)
    want = sorted(
        map(
            tuple,
            _st96_run(spark, SF_SMALL, str(tmp_path / "plain"), **kw).collect(),
        )
    )
    base = str(tmp_path / "both")
    log: list[dict] = []
    got = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, base, compact_every=2, refresh_log=log, **kw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert any("split_cell" in r for r in log)
    gen = os.listdir(os.path.join(base, "gen"))
    assert any(d.startswith("p=") for d in gen), gen  # overlay lives
    assert any(d.startswith("r=") for d in gen), gen  # minors folded
    assert any(d.startswith("re=") for d in gen), gen  # epoch generation


def test_split_crash_before_marker_is_invisible_and_refires(
    spark, tmp_path, monkeypatch
):
    """The crash window between the overlay's _SUCCESS and the patch
    marker: the unmarked overlay must stay invisible and the restarted
    stream must re-fire the split and converge to the clean run."""
    import os

    from pymongraph_spark.queries import streaming as st_mod
    from pymongraph_spark.queries.streaming import _st96_run

    want = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, str(tmp_path / "clean"), waves=3,
                refresh="occupancy", occupancy_target=2,
            ).collect(),
        )
    )

    base = str(tmp_path / "crash")
    real_replace = os.replace

    def boom(src, dst):
        if os.sep + "retrain" + os.sep in dst and os.path.basename(
            dst
        ).startswith("p="):
            raise OSError("injected crash before patch marker")
        return real_replace(src, dst)

    monkeypatch.setattr(st_mod.os, "replace", boom)
    with pytest.raises(Exception):
        _st96_run(
            spark, SF_SMALL, base, waves=3,
            refresh="occupancy", occupancy_target=2,
        ).collect()
    monkeypatch.setattr(st_mod.os, "replace", real_replace)

    overlays = [
        d for d in os.listdir(os.path.join(base, "gen")) if d.startswith("p=")
    ]
    assert overlays, "overlay should have committed before the crash"
    assert not [
        f
        for f in os.listdir(os.path.join(base, "retrain"))
        if f.startswith("p=")
    ], "patch marker must not exist after the crash"

    log: list[dict] = []
    recovered = sorted(
        map(
            tuple,
            _st96_run(
                spark, SF_SMALL, base, waves=3,
                refresh="occupancy", occupancy_target=2, refresh_log=log,
            ).collect(),
        )
    )
    assert recovered == want
    assert any("split_cell" in r for r in log), "split must re-fire"
    assert [
        f
        for f in os.listdir(os.path.join(base, "retrain"))
        if f.startswith("p=")
    ], "re-fired split must commit its marker"


def test_st96_occupancy_rule_equals_pinned_trigger(spark, tmp_path):
    """The production firing rule (occupancy monitor) and the gate's
    pinned trigger are the SAME retrain: pick a target that makes the
    monitor first fire at trigger 2 and assert pair-set equality with
    the pinned-at-2 run, plus the refresh_log evidence."""
    from pymongraph_spark.queries.streaming import _st96_run

    # calibrate: per-trigger max occupancy of the undersized codebook
    mon: list[dict] = []
    _st96_run(
        spark,
        SF_SMALL,
        str(tmp_path / "cal"),
        refresh=999,  # never fires — pure monitor run
        occupancy=mon,
    ).collect()
    max1, max2 = mon[1]["max_occupancy"], mon[2]["max_occupancy"]
    assert max2 > max1 + 4, "corpus too small to separate the triggers"
    target = max1 // 4 + 1  # max1 <= 4*target < max2

    log: list[dict] = []
    got = sorted(
        map(
            tuple,
            _st96_run(
                spark,
                SF_SMALL,
                str(tmp_path / "occ"),
                refresh="occupancy",
                occupancy_target=target,
                refresh_log=log,
            ).collect(),
        )
    )
    assert log and log[0]["batch_id"] == 2 and log[0]["k_new"] == 16
    want = sorted(
        map(tuple, _st96_run(spark, SF_SMALL, str(tmp_path / "pin")).collect())
    )
    assert got == want


def test_st96_retrain_composes_with_compaction(spark, tmp_path):
    """refresh + compact_every together: minors fold post-retrain
    batches, the staggered major may merge across the epoch generation,
    and pairs stay identical to the uncompacted retrain run."""
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    want = sorted(
        map(tuple, _st96_run(spark, SF_SMALL, str(tmp_path / "plain")).collect())
    )
    base = str(tmp_path / "both")
    got = sorted(
        map(tuple, _st96_run(spark, SF_SMALL, base, compact_every=2).collect())
    )
    assert got == want and len(got) > 0
    live = [
        d for d in os.listdir(os.path.join(base, "index")) if d.startswith("b=")
    ]
    assert len(live) <= 2, f"per-batch tier not folded: {live}"


def test_st96_multi_epoch_retrain_and_replay(spark, tmp_path):
    """A long drifting stream can fire the occupancy rule MORE THAN
    ONCE: with a tiny design target every trigger re-trips the rule, so
    the stream retrains repeatedly (epoch markers accumulate, each
    re-key covering a wider prefix) — and a replay of the last trigger
    after a checkpoint-commit loss must still be bit-identical, with
    the restart rebuilding the LATEST epoch's codebook."""
    import os

    from pymongraph_spark.queries.streaming import _st96_run

    base = str(tmp_path / "multi")
    log: list[dict] = []
    first = sorted(
        map(
            tuple,
            _st96_run(
                spark,
                SF_SMALL,
                base,
                refresh="occupancy",
                occupancy_target=1,  # 4*1: every trigger trips the rule
                refresh_k=16,
                refresh_log=log,
            ).collect(),
        )
    )
    retrains = [r for r in log if "k_new" in r]  # splits log separately
    assert len(retrains) >= 2, f"expected multiple retrains, got {log}"
    retrain_files = os.listdir(os.path.join(base, "retrain"))
    markers = sorted(
        int(f[2:-5]) for f in retrain_files if f.startswith("j=")
    )
    assert markers == [r["batch_id"] for r in retrains]
    # only the LATEST epoch's codebook artifact survives the sweep
    assert [f for f in retrain_files if f.startswith("cb=")] == [
        f"cb={markers[-1]}.json"
    ]
    # exactly one committed re= generation survives (the widest epoch)
    gens = [
        d
        for d in os.listdir(os.path.join(base, "gen"))
        if d.startswith("re=")
        and os.path.exists(os.path.join(base, "gen", d, "_SUCCESS"))
    ]
    assert gens == [f"re=0_{markers[-1]}"], gens

    commits = os.path.join(base, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if not f.startswith(".")), key=int)
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    replayed = sorted(
        map(
            tuple,
            _st96_run(
                spark,
                SF_SMALL,
                base,
                refresh="occupancy",
                occupancy_target=1,
                refresh_k=16,
            ).collect(),
        )
    )
    assert replayed == first


def test_st97_forced_split_fires_and_replays(spark, tmp_path):
    """st97's pinned split (split_at=2, no global retrain): exactly one
    split_cell record on the deterministically-hottest cell, an overlay
    generation + patch marker on disk, wave-3 pairs probing sub-cells —
    and a replayed stream (dropped last commit) neither re-splits nor
    changes the answer."""
    import json
    import os

    from pymongraph_spark.queries.streaming import _ST97_SPLIT_AT, _st97_run

    base = str(tmp_path / "st97")
    log: list[dict] = []
    mon: list[dict] = []
    first = sorted(
        map(
            tuple,
            _st97_run(
                spark, SF_SMALL, base, refresh_log=log, occupancy=mon
            ).collect(),
        )
    )
    assert len(first) > 0
    splits = [r for r in log if "split_cell" in r]
    assert len(splits) == 1 and splits[0]["batch_id"] == _ST97_SPLIT_AT
    # the split target is the argmax-count cell at the split trigger
    # (ties to the smallest id) — the pick the oracle replays in SQL
    trig = [r for r in mon if "end_state" not in r]
    assert trig[_ST97_SPLIT_AT]["index_rows"] > 0
    c = splits[0]["split_cell"]
    marker = json.load(
        open(os.path.join(base, "retrain", f"p={c}.json"))
    )
    assert marker["hi"] == _ST97_SPLIT_AT
    assert marker["k"] == splits[0]["k_split"] >= 2
    overlay = os.path.join(base, "gen", f"p={c}_{_ST97_SPLIT_AT}")
    assert os.path.exists(os.path.join(overlay, "_SUCCESS"))
    assert splits[0]["family_rows"] > 0
    # the overlay actually subdivides: re-keyed rows carry negative
    # sub-cell ids in the hot cell's stride range
    sub = spark.read.parquet(overlay).select("cell").distinct().collect()
    assert all(r["cell"] < 0 and (-r["cell"] - 1) // 64 == c for r in sub)
    # replay: drop the last streaming commit and re-run — the committed
    # patch marker makes the forced split a no-op (hi == trigger), and
    # the pairs are unchanged
    commits = os.path.join(base, "ckpt", "commits")
    last = max(
        (f for f in os.listdir(commits) if not f.startswith(".")), key=int
    )
    os.unlink(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.unlink(crc)
    relog: list[dict] = []
    replayed = sorted(
        map(
            tuple,
            _st97_run(spark, SF_SMALL, base, refresh_log=relog).collect(),
        )
    )
    assert replayed == first
    assert not [r for r in relog if "split_cell" in r]
