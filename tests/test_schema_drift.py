"""Testdata schema-drift sentinel.

The driver regenerates /root/testdata between rounds, and a silent dtype
change there surfaces as dozens of opaque oracle mismatches or
AnalysisExceptions (round 3: events.ts switched parquet encodings and
took out every event-table query). This test pins the dtypes every query
assumes, via the SAME catalog the queries read through, so drift fails
in ONE diagnosable place.

Columns where the engine is deliberately encoding-adaptive (events.ts —
catalog.table normalizes nanos-long / TIMESTAMP_NTZ / µs timestamp to a
plain timestamp) are asserted on the NORMALIZED type, which is the
contract downstream queries actually rely on.
"""

from __future__ import annotations

import pytest

from pymongraph_spark.catalog import load_tables

from tests.conftest import SF_SMALL

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # normalized by catalog.table, whatever the encoding
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

# Timestamp-ish columns: accept timestamp or timestamp_ntz — both compare
# identically against the DuckDB oracle under the UTC session timezone,
# and queries only do ordering/truncation/diff arithmetic on them.
_TS_OK = {"timestamp", "timestamp_ntz"}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_matches_assumptions(spark, table):
    df = load_tables(spark, SF_SMALL)[table]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    exp = EXPECTED[table]
    assert set(got) == set(exp), f"{table}: columns {sorted(got)} != {sorted(exp)}"
    for col, want in exp.items():
        have = got[col]
        if want == "timestamp":
            assert have in _TS_OK, f"{table}.{col}: {have} not timestamp-like"
        else:
            assert have == want, f"{table}.{col}: {have} != {want}"


def test_embeddings_are_non_empty(spark):
    """s56's oracle list_reduce errors on zero-length embeddings (both
    sides now filter them, but an all-empty generation would silently
    empty the gate row) — fail loudly here if the generator ever emits
    empty vectors."""
    from pyspark.sql import functions as F

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    n_empty = emb.filter(F.size("embedding") <= 0).count()
    assert n_empty == 0, f"{n_empty} zero-length embeddings in {SF_SMALL}"
