"""Registry machinery for oracle-checked queries.

Each registered callable has signature ``(spark, sf_dir) -> DataFrame``.
Column names in the Spark result and the oracle SQL must match exactly —
the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pymongraph_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_GC_WINDOW_SECONDS = 5.0
_last_gc = 0.0


def _maybe_gc() -> None:
    """Full gc.collect() at most once per _GC_WINDOW_SECONDS (see the
    rationale in query()'s wrapper)."""
    global _last_gc
    import time

    now = time.monotonic()
    if now - _last_gc >= _GC_WINDOW_SECONDS:
        import gc

        gc.collect()
        _last_gc = time.monotonic()


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release dropped JVM references before building a new plan:
            # query frames hold JVM-side state (localCheckpoint blocks,
            # broadcasts, persisted loop frames) that is only freed when
            # Python's GC runs the py4j finalizers, and CPython's cycle
            # collector can lag many queries behind in a long session.
            # The backlog evicts/GC-thrashes the shared local-mode JVM —
            # measured on t107 ×10: median 15.8s max 84.5s without the
            # collect vs 11.1s max 12.9s with it (same tree, same host).
            # TIME-GATED (optimization r14): a full collect measured
            # 35-65 ms in a warm session, and it sat inside every timed
            # bench sample — ~180 wrapper calls per bench run. The
            # backlog that matters accumulates over seconds of heavy
            # query builds, not per call, so one collect per 5s window
            # keeps the thrash fix (a heavy query's runs each exceed the
            # window and still collect every time) while sub-second
            # queries stop paying 40 ms per 250 ms sample. Computes
            # nothing and caches nothing — pure release.
            _maybe_gc()
            tune(spark)  # UTC tz + AQE, even on a driver-provided session
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
