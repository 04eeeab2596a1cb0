"""mtime-monotone staging for watermarked file-source streams.

Spark's file streaming source processes new files in MODIFICATION-TIME
order (FileStreamSource sorts candidate files by (mtime, path), at
millisecond granularity). For a watermarked stream that makes arrival
order a CORRECTNESS input, not a performance detail: if a writer stamps
several files the same mtime — every parallel `df.write` does — the
order within the tie is arbitrary. When the newest-data file happens to
be processed first, the watermark jumps to near-max event time and every
older file drained after it is late-dropped wholesale. Measured on the
st86 probe's first run: 81% of the expected interval-join pairs lost
exactly this way (SCALE_PROBE_st86.json; SCALE.md round-9).

This module turns the footnote "replay must arrive mtime-monotone" into
a product guarantee:

- ``stage_time_sorted`` — the writer helper: range-partition a batch
  frame by event time (for ``repartitionByRange`` the part-file index
  IS the range order) and stamp STRICTLY INCREASING mtimes in that
  order, so replaying the directory through any watermarked file source
  can never late-drop.
- ``stamp_monotone_mtimes`` — the stamping half alone, for directories
  whose files are already written in the desired processing order
  (lexicographic name order by default, matching Spark's part-file
  numbering).
- ``warn_same_mtime`` — the loud detector: called by the file-source
  constructors in this package before a watermarked stream starts; any
  group of data files tied at millisecond mtime granularity raises a
  ``UserWarning`` naming the files (and is returned, for tests).

At 100 TB this is the difference between a replayable archive and a
silently lossy one: a backfill of a month of event data through a
watermarked pipeline is only deterministic if the staging layer owns
the arrival order.
"""

from __future__ import annotations

import os
import time
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# millisecond granularity — what Hadoop FileStatus.getModificationTime
# (and therefore the file source's ordering key) actually sees
_MTIME_QUANTUM = 1e-3


def _data_files(input_dir: str) -> list[str]:
    """Data files the file source would list: no dotfiles, no _SUCCESS /
    _COMMITTED-style markers, no subdirectory recursion (the staged dirs
    this package builds are flat)."""
    try:
        names = os.listdir(input_dir)
    except OSError:
        return []
    return sorted(
        os.path.join(input_dir, n)
        for n in names
        if not n.startswith((".", "_"))
        and os.path.isfile(os.path.join(input_dir, n))
    )


def stamp_monotone_mtimes(
    input_dir: str, order: list[str] | None = None, step: float = 2.0
) -> list[str]:
    """Stamp strictly increasing mtimes on the data files of
    ``input_dir`` in processing order (default: lexicographic basename
    order — Spark part-file numbering). Stamps end at "now" so the files
    never appear to come from the future. Returns the ordered paths."""
    files = order if order is not None else _data_files(input_dir)
    if not files:
        return []
    t0 = time.time() - step * (len(files) - 1)
    for i, path in enumerate(files):
        ts = t0 + step * i
        os.utime(path, (ts, ts))
    return files


def stage_time_sorted(
    df: DataFrame,
    out_dir: str,
    ts_col: str,
    n_files: int,
    fmt: str = "parquet",
) -> list[str]:
    """Write a batch frame as ``n_files`` event-time-range files whose
    mtimes ascend in event-time order — the safe way to stage historical
    event data for replay through a watermarked file source.

    ``repartitionByRange(n, ts)`` assigns ascending time ranges to
    ascending partition ids, and part-file names embed the partition id
    (part-00000…), so lexicographic name order == event-time order;
    ``stamp_monotone_mtimes`` then makes that the processing order. The
    watermark therefore advances monotonically across micro-batches and
    no file's rows can arrive behind an already-advanced watermark.
    """
    (
        df.repartitionByRange(n_files, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .format(fmt)
        .save(out_dir)
    )
    return stamp_monotone_mtimes(out_dir)


def warn_same_mtime(input_dir: str, context: str = "") -> list[list[str]]:
    """Detect same-mtime data files in a stream source directory and warn
    LOUDLY: ties make the file source's processing order arbitrary, which
    under a watermark can late-drop whole files (81% pair loss measured;
    SCALE.md round-9). Returns the colliding groups (each a list of
    paths) so callers/tests can assert on them."""
    by_ms: dict[int, list[str]] = {}
    for path in _data_files(input_dir):
        try:
            ms = int(os.path.getmtime(path) / _MTIME_QUANTUM)
        except OSError:
            continue
        by_ms.setdefault(ms, []).append(path)
    groups = [sorted(g) for ms, g in sorted(by_ms.items()) if len(g) > 1]
    if groups:
        flat = [os.path.basename(p) for g in groups for p in g]
        warnings.warn(
            f"{len(flat)} files in {input_dir} share a millisecond-level "
            "modification time; the file streaming source orders files by "
            "mtime, so their arrival order is ARBITRARY — under a "
            "watermark this can late-drop whole files (measured: 81% of "
            "st86's join pairs). Stage with "
            "pymongraph_spark.streaming.staging.stage_time_sorted / "
            "stamp_monotone_mtimes before streaming"
            + (f" [{context}]" if context else "")
            + f": {flat[:8]}{'…' if len(flat) > 8 else ''}",
            UserWarning,
            stacklevel=2,
        )
    return groups


def mtime_tie_monitor(input_dir: str, context: str = ""):
    """Incremental form of :func:`warn_same_mtime` for LONG-RUNNING
    streams: a start-only check misses every file that lands after the
    stream begins — the parallel-writer scenario this module exists for.
    Returns a zero-argument callable for the foreachBatch handler to
    invoke once per micro-batch; each call scans only files not yet seen
    (one ``os.listdir`` — cheap at any batch cadence) and warns on any
    millisecond-mtime tie a NEW file participates in, whether with
    another new file or with one already processed (either way the
    source's pick order within the tie was arbitrary). Each colliding
    group is reported once; the monitor accumulates all groups and the
    callable returns the cumulative list, for tests."""
    seen: dict[str, int] = {}
    reported: set[tuple[str, ...]] = set()
    groups_all: list[list[str]] = []

    def check() -> list[list[str]]:
        by_ms: dict[int, list[str]] = {}
        new_ms: set[int] = set()
        for path in _data_files(input_dir):
            if path in seen:
                by_ms.setdefault(seen[path], []).append(path)
                continue
            try:
                ms = int(os.path.getmtime(path) / _MTIME_QUANTUM)
            except OSError:
                continue
            seen[path] = ms
            by_ms.setdefault(ms, []).append(path)
            new_ms.add(ms)
        fresh = []
        for ms in sorted(new_ms):
            g = sorted(by_ms[ms])
            if len(g) > 1 and tuple(g) not in reported:
                reported.add(tuple(g))
                fresh.append(g)
        if fresh:
            groups_all.extend(fresh)
            flat = [os.path.basename(p) for g in fresh for p in g]
            warnings.warn(
                f"{len(flat)} files in {input_dir} share a millisecond-"
                "level modification time (detected mid-stream); their "
                "arrival order through the file source was ARBITRARY — "
                "under a watermark this can late-drop whole files. Stage "
                "writers with stage_time_sorted / stamp_monotone_mtimes"
                + (f" [{context}]" if context else "")
                + f": {flat[:8]}{'…' if len(flat) > 8 else ''}",
                UserWarning,
                stacklevel=2,
            )
        return groups_all

    return check
