"""SparkSession bootstrap tuned for this engine.

The reference opens a MongoClient per MongoGraph instance
(/root/reference/mongraph.py:8-27); our equivalent is one SparkSession with
scale-oriented defaults: AQE (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for the pandas-UDF paths, and UTC session time
so timestamp semantics match the DuckDB oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also (re-)apply to externally created sessions
# (the driver hands us its own SparkSession) — determinism + perf hygiene.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided or ours)."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — keep going
    return spark


def get_spark(
    app_name: str = "sparkgraph",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local session for tests/bench. On a real cluster the caller provides
    the session; everything downstream only assumes a SparkSession."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 16g default: local[32] runs all executor threads in the driver
        # JVM, and an 8g heap GC-thrashed under accumulated broadcasts +
        # cached graph tables (observed 2.6s -> 17s swings on repeat runs)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # GC reliable-checkpoint files once their RDDs go out of scope
        # (deep iterative loops checkpoint when a checkpoint dir is set)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def run_concurrently(*thunks):
    """Run independent Spark ACTIONS in parallel driver threads and return
    their results in argument order (exceptions propagate).

    Spark's scheduler accepts concurrent job submission from multiple
    driver threads; the ingest hot path materializes a vertices/edges
    PAIR at several points (staging checkpoints, version writes, delta
    appends) and running the pair sequentially leaves half the cluster
    idle during each job's tail. At bench scale this is a fixed-cost
    win per micro-batch; on a real cluster it overlaps two independent
    DAGs that share no shuffle dependencies.
    """
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        return [f.result() for f in [ex.submit(t) for t in thunks]]
