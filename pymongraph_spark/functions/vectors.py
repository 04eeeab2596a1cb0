"""Vector expressions over embedding columns (array<float>).

Dot products / norms are built from ``zip_with`` + ``aggregate`` — strict
left-to-right folds, so the IEEE double result is identical across engines
and partitionings (the basis of oracle parity AND of deterministic re-runs
on a cluster). Inputs are cast to double first (float→double is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    den = norm(a) * norm(b)
    return F.when(den != 0, dot(a, b) / den)


def l2_normalize(a: Column, staged_norm: Column | None = None) -> Column:
    """Unit-normalize a float array; zero vectors pass through unchanged
    (the guarded division the ANSI-mode runtime requires — an unguarded
    v / norm raises DIVIDE_BY_ZERO on an all-zero embedding). The guard
    is hoisted to the ROW level (one when() per row, not per element).

    HOFs run interpreted, so an expression referenced inside the
    transform lambda is re-evaluated per element: pass ``staged_norm``
    — the norm materialized as its own projection column — from any
    hot-path call site (the staged-HOF-input discipline used throughout
    operators/dedup.py); the default inline norm is for casual or
    small-frame use."""
    n = staged_norm if staged_norm is not None else norm(a)
    return F.when(
        n != 0, F.transform(a, lambda v: (v / n).cast("float"))
    ).otherwise(F.transform(a, lambda v: v.cast("float")))
