"""Scalar functions from the reference importer (SURVEY.md §2.8), as
JVM-side Column expressions (no Python UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — IPv4 classification (graph_importer.py:32-38): same octet-range
# regex, anchored full-match.
IPV4_RE = (
    r"^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\.){3}"
    r"([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$"
)


def is_ipv4(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.rlike(IPV4_RE)


def classify_resource(c: Column | str) -> Column:
    """ip/domain label split (graph_importer.py:63-68)."""
    return F.when(is_ipv4(c), F.lit("ip")).otherwise(F.lit("domain"))


def parse_ratio(c: Column | str) -> Column:
    """F3 — '"detected/checker"' → float ratio (graph_importer.py:109-110).

    B8 intent: malformed/missing prob strings yield NULL (avg skips
    nulls) instead of the reference's ValueError crash. STRICT like the
    importer's ``map(int, split('/'))``: exactly two '/'-separated
    integer tokens — a lax parse (grab elements 1-2, float casts) would
    accept '1/2/3' or '2.5/10' that the graph-import path rejects,
    giving two answers for the same data."""
    c = F.col(c) if isinstance(c, str) else c
    parts = F.split(F.trim(c), "/")
    int_re = r"^[+-]?[0-9]+$"
    # try_element_at: a string with no '/' has one token, and ANSI
    # element_at would throw instead of yielding the B8 NULL
    num_s = F.trim(F.try_element_at(parts, F.lit(1)))
    den_s = F.trim(F.try_element_at(parts, F.lit(2)))
    ok = (F.size(parts) == 2) & num_s.rlike(int_re) & den_s.rlike(int_re)
    return F.when(ok & (den_s.cast("double") != 0),
                  num_s.cast("double") / den_s.cast("double"))


def flatten_indexed(prefix: str, arr: Column) -> Column:
    """F5 — list property → {field_0: v0, field_1: v1, ...} map
    (graph_importer.py:155-161). Kept for parity; ArrayType columns are the
    preferred native representation."""
    idx = F.sequence(F.lit(0), F.size(arr) - 1)
    keys = F.transform(idx, lambda i: F.concat(F.lit(prefix + "_"), i.cast("string")))
    vals = F.transform(arr, lambda x: x.cast("string"))
    # sequence(0, -1) would yield the descending [0, -1] for empty arrays,
    # mismatching the 0-length values array — return an empty map instead.
    # NULL input stays NULL (the reference importer never writes the
    # property at all for a missing list; NULL-in/NULL-out mirrors that).
    return (
        F.when(arr.isNull(), F.lit(None).cast("map<string,string>"))
        .when(F.size(arr) > 0, F.map_from_arrays(keys, vals))
        .otherwise(
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
        )
    )
