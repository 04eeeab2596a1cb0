"""Mirror of the driver's correctness gate: run every registered query
through Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive values. Catching a hash mismatch here is 100× cheaper
than catching it in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import os

from pymongraph_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_SMALL as _SF_DEFAULT

# Default sf0.001 for speed; CI-style full check: SPARKGRAPH_TEST_SF=/root/testdata/sf0.01
SF_SMALL = os.environ.get("SPARKGRAPH_TEST_SF", _SF_DEFAULT)


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — we claim bit-exact parity
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(pdf):
    cols = sorted(pdf.columns)
    rows = []
    for t in pdf[cols].itertuples(index=False):
        rows.append("|".join(_canon_cell(v) for v in t))
    return sorted(rows)


def _compare(name: str, spark, sf_dir: str):
    sdf = QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()
    opdf = _duck(sf_dir, ORACLES[name])
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column mismatch {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
    )
    s_rows, o_rows = _canon_rows(spdf), _canon_rows(opdf)
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row diffs; first: {mismatches[0]}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark):
    _compare(name, spark, SF_SMALL)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_q29_hll_anchored_by_q58_exact(spark):
    """q29 (HLL, rows-only gate) is anchored by q58: identical grouping,
    exact count_distinct, full oracle. At rsd=0.01 the estimate must land
    well within 3% of exact."""
    approx = {
        r["l_returnflag"]: (r["approx_parts"], r["approx_suppliers"])
        for r in QUERIES["q29_approx_count_distinct"](spark, SF_SMALL).collect()
    }
    exact = {
        r["l_returnflag"]: (r["exact_parts"], r["exact_suppliers"])
        for r in QUERIES["q58_exact_distinct_by_returnflag"](spark, SF_SMALL).collect()
    }
    assert set(approx) == set(exact)
    for flag, (ap, asu) in approx.items():
        ep, esu = exact[flag]
        assert abs(ap - ep) <= max(3, 0.03 * ep), (flag, ap, ep)
        assert abs(asu - esu) <= max(3, 0.03 * esu), (flag, asu, esu)
