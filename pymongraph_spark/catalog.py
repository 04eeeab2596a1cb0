"""Table catalog over the driver-generated parquet directories (TESTDATA.md).

The reference binds two MongoDB collections at init
(/root/reference/mongraph.py:20-21); our catalog binds a directory of
columnar tables. Reads are plain ``spark.read.parquet`` so Catalyst gets
predicate pushdown / column pruning / partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_SCRATCH_GRACE_SECS = 600


def _sweep_dead_scratch(temp_root: str) -> None:
    """Reclaim sibling ``sparkgraph_*`` scratch dirs whose embedded PID is
    no longer alive. PID-keyed names make concurrent-process rmtree races
    impossible, but they also mean a dead process's dirs are never reused
    — without this sweep every run permanently orphans its stream-staging
    and sink outputs under /tmp, unbounded on long-lived hosts. Age grace:
    only dirs idle past _SCRATCH_GRACE_SECS are touched (covers the
    create-then-check window and PID-recycling edge reads). A live PID —
    including a recycled one — always skips: conservative, at worst the
    orphan waits for a later sweep."""
    import shutil
    import time

    now = time.time()
    try:
        names = os.listdir(temp_root)
    except OSError:
        return
    for name in names:
        if not name.startswith("sparkgraph_"):
            continue
        parts = name.split("_")
        if len(parts) < 4:
            continue
        try:
            pid = int(parts[-2])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
            continue  # owner alive → untouchable
        except ProcessLookupError:
            pass  # owner dead → candidate
        except OSError:
            continue  # EPERM etc.: treat as alive
        path = os.path.join(temp_root, name)
        try:
            if now - os.stat(path).st_mtime < _SCRATCH_GRACE_SECS:
                continue
            shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def scratch_dir(kind: str, sf_dir: str) -> str:
    """Process-scoped scratch path for queries that write and read back
    (demo sinks, store round-trips, stream staging dirs). Keyed by PID so
    two concurrent processes (driver gate + a test run, say) can never
    rmtree each other's directory mid-read — the same race class as the
    r5 bucketed-pair cache, solved here by isolation rather than
    attach-or-build because these dirs are throwaway fixtures, not
    shared caches. The salted-hash suffix keeps same-process re-runs
    idempotent under one stable name; orphans of dead processes are
    reclaimed by _sweep_dead_scratch at every creation (age-gated,
    liveness-checked), so long-lived hosts don't accumulate them."""
    import tempfile

    _sweep_dead_scratch(tempfile.gettempdir())
    return os.path.join(
        tempfile.gettempdir(),
        f"sparkgraph_{kind}_{os.getpid()}_{abs(hash(sf_dir)) % 10**8}",
    )


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
        # generations and TIMESTAMP(MICROS) in others, so adapt to what the
        # footer actually says instead of assuming one encoding:
        #   * NANOS  — Spark rejects it unless read as long (nanosAsLong),
        #     then integer-divide to µs (ns longs exceed 2^53, so float
        #     division would corrupt them) and rebuild a timestamp.
        #   * MICROS (isAdjustedToUTC=false) — Spark reads TIMESTAMP_NTZ;
        #     cast to TIMESTAMP, which under our UTC session timezone
        #     (session.RUNTIME_CONF) is instant-preserving.
        # DuckDB reads either encoding as a µs TIMESTAMP, so both engines
        # see identical instants and downstream queries always get a plain
        # TimestampType "ts" column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


class _LazyTables(dict):
    """Table-name → DataFrame mapping that only touches a parquet footer
    when the table is actually used (so one bad/unneeded table never
    blocks an unrelated query, and entry() stays minimal)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(name)
        df = table(self._spark, self._sf_dir, name)
        self[name] = df
        return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as lazily-bound DataFrames."""
    return _LazyTables(spark, sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    dfs = load_tables(spark, sf_dir)
    for name in TABLES:
        dfs[name].createOrReplaceTempView(name)
    return dfs
