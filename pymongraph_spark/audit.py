"""Plan-audit instrumentation.

``localCheckpoint(eager=True)`` truncates lineage: the returned frame's
executedPlan is just a LogicalRDD scan, so a CartesianProduct or
BatchEvalPython UPSTREAM of the checkpoint is invisible to any lint that
only inspects the final frame (ADVICE r5 #1 — the registry sweep was
silently vacuous for d53/d54/d55/t83 and every iterative graph algo).

``capture_checkpoint_inputs`` closes that hole without touching the ~60
call sites: while active, every ``DataFrame.localCheckpoint`` call first
records the PRE-checkpoint frame. Each recorded frame's plan covers
exactly the pipeline segment since the previous checkpoint (its own
upstream checkpoints appear as LogicalRDD scans, which the next-older
capture covers), so linting ``[final frame] + captured`` sweeps every
plan segment of the query with no gaps.

Audit-only: nothing in the library itself depends on this module.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def capture_checkpoint_inputs():
    """Yields a list that accumulates the input frame of every
    ``DataFrame.localCheckpoint`` call made while the context is active
    (single-threaded audit use; restores the original method on exit,
    nesting-safe)."""
    # patch the CONCRETE class: in PySpark 4 classic mode, instances are
    # pyspark.sql.classic.dataframe.DataFrame, which overrides
    # localCheckpoint — patching the abstract pyspark.sql.DataFrame would
    # intercept nothing
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older PySpark: single DataFrame class
        from pyspark.sql import DataFrame

    captured: list[DataFrame] = []
    orig = DataFrame.localCheckpoint

    def recording(self, *args, **kwargs):
        # pass-through signature: PySpark 4's localCheckpoint also takes
        # storageLevel — narrowing it here would TypeError only under
        # audit, turning a fine query into a phantom lint failure
        captured.append(self)
        return orig(self, *args, **kwargs)

    DataFrame.localCheckpoint = recording
    try:
        yield captured
    finally:
        DataFrame.localCheckpoint = orig


def all_plan_segments(df, captured) -> list[str]:
    """executedPlan strings for the final frame plus every captured
    pre-checkpoint frame — together, every plan segment of the query.
    Planning only; nothing is executed."""
    plans = []
    for frame in [df, *captured]:
        plans.append(frame._jdf.queryExecution().executedPlan().toString())
    return plans
