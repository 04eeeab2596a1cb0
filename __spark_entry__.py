"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1 shape) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 / §2.13.
oracle_sql()    — matching DuckDB SQL for the driver's correctness gate.

The registry lives in pymongraph_spark.queries; importing it registers
relational, graph, LLM-pipeline, and streaming queries.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pymongraph_spark.queries import ORACLES, QUERIES

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def _row_passed(row: object) -> bool:
    """True only for rows that actually verified: full hash-match, or the
    rows-only tier the driver records for queries without an oracle
    (err == "no_oracle" with a materialized spark row count). Failed or
    errored rows do NOT count, so those queries keep sorting to the front
    of the 50-entry gate until they pass."""
    if not isinstance(row, dict):
        return False
    if row.get("err") is None:
        return bool(
            row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        )
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def _last_gated_round() -> dict[str, int]:
    """query name -> most recent round with a PASSING CORRECTNESS row."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        try:
            rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
            with open(path) as f:
                rows = json.load(f)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if _row_passed(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _changed_since_gate(last: dict[str, int]) -> set[str]:
    """Queries whose implementation fingerprint (callable source +
    oracle string — queries/fingerprints.py) differs from the snapshot
    taken of the tree their last driver gate ran on (GATE_FPS.json,
    written per round by scripts/snapshot_gate_fps.py). Unknown
    snapshots degrade to 'unchanged' — the pre-r13 behavior."""
    path = os.path.join(_REPO_DIR, "GATE_FPS.json")
    try:
        with open(path) as f:
            snaps = json.load(f).get("snapshots", {})
    except (OSError, json.JSONDecodeError):
        return set()
    if not snaps:
        return set()
    from pymongraph_spark.queries.fingerprints import current_fingerprints

    cur = current_fingerprints()
    changed = set()
    for name, rnd in last.items():
        fp_at_gate = snaps.get(str(rnd), {}).get(name)
        if fp_at_gate is not None and fp_at_gate != cur.get(name):
            changed.add(name)
    return changed


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver's correctness gate records only the first 50 registry
    entries per round, so the order rotates by verification staleness.
    Queries that have NEVER received a driver row lead (rank 0): local
    sf0.01 prechecks via scripts/gate_precheck.py are mitigation, but
    the driver gate is the hard signal, and ranking never-gated queries
    behind stale greens provably starves them once the gated population
    settles into window-sized cohorts (the round-6 verdict caught
    exactly that steady state: three 50-query cohorts cycling forever).
    Queries EDITED since their last gate rank with the never-gated
    block (VERDICT r12 item 2: a gated green certifies the code it ran
    on, and r12 left five queries wearing r11 greens over r12 edits) —
    detected by comparing the current implementation fingerprint to the
    per-round snapshot in GATE_FPS.json. After that block, gated
    queries follow in ascending last-gated-round order (stalest first —
    regenerated testdata can silently break old greens; round-3's
    schema drift proved it), name as tie-break. Once every query has a
    current driver row, the registry cycles through the gate every
    ceil(N/50) rounds.
    """
    last = _last_gated_round()
    changed = _changed_since_gate(last)

    ordered = sorted(
        QUERIES, key=lambda k: (0 if k in changed else last.get(k, 0), k)
    )
    return {k: QUERIES[k] for k in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
