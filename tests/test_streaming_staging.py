"""mtime-monotone staging guard for watermarked file-source streams
(VERDICT r9 item 3; SCALE.md round-9 arrival hazard).

The first test REPRODUCES the production failure raw — adversarial file
mtimes make the watermark jump ahead and late-drop whole files of an
interval join's input (81% pair loss on the st86 probe's first run) —
and shows the same data staged through ``stage_time_sorted`` emits the
exact batch ground truth.
"""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from pymongraph_spark.queries.streaming import _run_to_memory, interval_join_streams
from pymongraph_spark.streaming.staging import (
    stage_time_sorted,
    stamp_monotone_mtimes,
    warn_same_mtime,
)

N_USERS = 10
N_PER_USER = 30  # every 4 min over 2 h → each event pairs only with its
# successor (4 min ≤ 5 min window; 8 min exceeds it)


def _events_df(spark):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (u * 1000 + i, u, base + dt.timedelta(minutes=4 * i))
        for u in range(N_USERS)
        for i in range(N_PER_USER)
    ]
    return spark.createDataFrame(rows, "event_id: long, user_id: long, ts: timestamp")


def _expected_pairs() -> int:
    # per user: (i, i+1) for i in 0..N_PER_USER-2
    return N_USERS * (N_PER_USER - 1)


def _drain_pairs(spark, src_dir: str) -> int:
    schema = spark.read.parquet(src_dir).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = _run_to_memory(interval_join_streams(ev, ev), "staging_guard", "append")
    return sink.filter(F.col("event_id_a") < F.col("event_id_b")).count()


def test_adversarial_mtimes_late_drop_and_guard_restores(spark, tmp_path):
    """Raw: newest-data file carries the EARLIEST mtime (one adversarial
    draw of the arbitrary order a same-mtime parallel write produces) →
    the watermark jumps on batch 1 and the older files are late-dropped
    wholesale. Guarded: stage_time_sorted replays the identical rows and
    emits the exact ground truth."""
    df = _events_df(spark)
    expected = _expected_pairs()

    # ---- raw: 4 time-range files, mtimes REVERSED ----
    raw_dir = str(tmp_path / "raw")
    ordered = stage_time_sorted(df, raw_dir, "ts", 4)
    assert len(ordered) == 4
    now = time.time()
    for i, path in enumerate(reversed(ordered)):  # newest data ← oldest mtime
        os.utime(path, (now - 40 + 10 * i, now - 40 + 10 * i))
    raw_pairs = _drain_pairs(spark, raw_dir)
    # the late-drop is wholesale: well under half the pairs survive
    assert raw_pairs < expected / 2, (raw_pairs, expected)

    # ---- guarded: same rows, mtime-monotone staging ----
    safe_dir = str(tmp_path / "safe")
    stage_time_sorted(df, safe_dir, "ts", 4)
    assert warn_same_mtime(safe_dir) == []  # strictly increasing stamps
    assert _drain_pairs(spark, safe_dir) == expected


def test_stage_time_sorted_files_ascend_in_event_time(spark, tmp_path):
    out = str(tmp_path / "staged")
    files = stage_time_sorted(_events_df(spark), out, "ts", 4)
    assert [os.path.basename(f) for f in files] == sorted(
        os.path.basename(f) for f in files
    )
    # part index order == ts-range order == mtime order
    mins = [
        spark.read.parquet(f).agg(F.min("ts")).first()[0] for f in files
    ]
    assert mins == sorted(mins)
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)


def test_warn_same_mtime_detects_and_stamp_clears(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    for n in ("a.parquet", "b.parquet", "c.parquet"):
        (d / n).write_text("x")
    t = time.time() - 60
    for n in ("a.parquet", "b.parquet", "c.parquet"):
        os.utime(d / n, (t, t))
    (d / "_SUCCESS").write_text("")  # markers never counted
    with pytest.warns(UserWarning, match="ARBITRARY"):
        groups = warn_same_mtime(str(d))
    assert len(groups) == 1 and len(groups[0]) == 3
    stamp_monotone_mtimes(str(d))
    assert warn_same_mtime(str(d)) == []


def test_mtime_tie_monitor_catches_mid_stream_ties(tmp_path):
    """ADVICE r10: a start-only tie check misses files landing after the
    stream begins. The per-batch monitor must (a) pass a clean staged
    dir, (b) warn when NEW files tie with each other, (c) warn when a
    new file ties with an ALREADY-SEEN one, (d) never re-report a group."""
    from pymongraph_spark.streaming.staging import mtime_tie_monitor

    d = tmp_path / "src"
    d.mkdir()
    t = time.time() - 120
    for i, n in enumerate(("a.jsonl", "b.jsonl")):
        (d / n).write_text("x")
        os.utime(d / n, (t + i, t + i))
    check = mtime_tie_monitor(str(d), context="test")
    assert check() == []  # clean start

    # two NEW files land mid-stream with a shared millisecond mtime
    for n in ("c.jsonl", "d.jsonl"):
        (d / n).write_text("x")
        os.utime(d / n, (t + 10, t + 10))
    with pytest.warns(UserWarning, match="mid-stream"):
        groups = check()
    assert [sorted(os.path.basename(p) for p in g) for g in groups] == [
        ["c.jsonl", "d.jsonl"]
    ]

    # a new file tying with an ALREADY-PROCESSED one is just as arbitrary
    (d / "e.jsonl").write_text("x")
    os.utime(d / "e.jsonl", (t + 1, t + 1))  # ties with b.jsonl
    with pytest.warns(UserWarning, match="mid-stream"):
        groups = check()
    assert len(groups) == 2
    assert sorted(os.path.basename(p) for p in groups[1]) == ["b.jsonl", "e.jsonl"]

    # idempotent: nothing new → no warning, same cumulative groups
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert len(check()) == 2
