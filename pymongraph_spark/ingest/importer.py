"""Threat-intel JSON → property graph ETL (reference:
/root/reference/graph_importer.py:51-175, SURVEY.md §2.10).

Architecture (Spark-first, two layers):

1. **Parse** — the report format is open-world (dynamic top-level resource
   key, fields that are string-or-nested-report, arbitrary residual keys),
   and the reference's extraction is a depth-first recursion. A declared
   nested schema cannot express "string | recursive dict" unions, so the
   parse step runs as an Arrow-batched ``mapInPandas``: each report is
   flattened LOCALLY (no data movement) into a long staging format of
   vertex/edge/detection rows. This is per-row embarrassingly parallel —
   the one place Python is genuinely warranted (SURVEY §2.10 maps the
   recursion to data-parallel flattening).

2. **Merge** — everything that shuffles is DataFrame ops:
   first-insert-wins / last-update-wins property merges, natural-key
   vertex dedup and (src, dst, label) edge dedup — all JVM-side
   expressions, no UDFs. (The A1 ``detected_prop`` avg is visit-local
   by construction — one report body — so it is computed in the parse
   layer at its exact reference position, graph_importer.py:131-138
   with the B8 skip-malformed intent.)

Reference write semantics preserved exactly:
- ``insert_vertex`` with ``identify`` → FIRST insert wins, later inserts
  return the existing vertex untouched (mongraph.py:90-97).
- ``update_vertex`` → $set merge, later keys win (mongraph.py:195-203).
- ``insert_edge`` → one edge per directed (src, dst, label); first
  insert's props stick (mongraph.py:120-130).
- detection prob "x/y" → ratio; malformed/missing prob is SKIPPED (null,
  avg ignores it) per the B8 intent instead of the reference's crash.
- every processed (dict-typed) resource gets ``detected_prop`` (0.0 when
  it has no parseable detections — graph_importer.py:131-138).
- whois contacts (admin/tech/registrant with email) → ``owner`` vertex
  keyed by email, ``belongTo`` edge owner→resource (graph_importer.py:
  141-151 via mongraph.py:132-151; label registered per B5 intent).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongraph_spark.graph.model import PropertyGraph, edge_id, vertex_id
from pymongraph_spark.session import run_concurrently

# graph_importer.py:11-23 — relation fields not copied as plain properties.
NOT_BROWSE_FIELDS = [
    "whois",
    "domain-siblings",
    "dns-resolutions",
    "observed-subdomains",
    "detected-urls",
    "detected-downloaded",
    "undetected-downloaded",
    "detected-referrer",
    "undetected-referrer",
    "detected-communicating",
    "undetected-communicating",
]

LEGITIMATE_LIST = ["undetected-downloaded", "undetected-communicating", "undetected-referrer"]
MALICIOUS_LIST = ["detected-downloaded", "detected-communicating", "detected-referrer"]

_IPV4_RE = re.compile(
    r"^(([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])\.){3}"
    r"([0-9]|[1-9][0-9]|1[0-9]{2}|2[0-4][0-9]|25[0-5])$"
)

# Long staging format emitted by the parser.
#   kind: 'v' insert-vertex | 'u' update-vertex | 'e' insert-edge
#       | 'x' dead-lettered input (ratio column retained for schema
#       stability; the A1 avg is computed visit-locally in the parser)
STAGING_SCHEMA = (
    "ord bigint, seq bigint, kind string, label string, key string, "
    "src_label string, src_key string, dst_label string, dst_key string, "
    "edge_label string, props map<string,string>, ratio double"
)

_COLS = [
    "ord", "seq", "kind", "label", "key",
    "src_label", "src_key", "dst_label", "dst_key",
    "edge_label", "props", "ratio",
]


def _resource_name(resource) -> str | None:
    """graph_importer.py:40-49 — first key of a dict, else the value."""
    if isinstance(resource, dict):
        return next(iter(resource.keys()), None)
    return resource


def flatten_report(report: dict, ord_: int = 0) -> list[tuple]:
    """Pure-Python DFS over one report, mirroring
    graph_importer._extract_data_and_save (graph_importer.py:51-168) but
    emitting staging rows instead of issuing Mongo RPCs. Runs inside
    mapInPandas on executor-local data."""
    rows: list[tuple] = []
    seq = 0

    def emit(kind, label=None, key=None, src=None, dst=None, edge_label=None,
             props=None, ratio=None):
        nonlocal seq
        rows.append((
            ord_, seq, kind, label, key,
            src[0] if src else None, src[1] if src else None,
            dst[0] if dst else None, dst[1] if dst else None,
            edge_label,
            # `is not None`: an EMPTY props dict must become an empty map,
            # not NULL — map_concat(acc, NULL) nulls the whole vertex fold
            {k: ("" if v is None else str(v)) for k, v in props.items()}
            if props is not None
            else None,
            ratio,
        ))
        seq += 1

    def classify(name: str) -> str:
        return "ip" if _IPV4_RE.match(name) else "domain"

    def walk(resource) -> None:
        name = _resource_name(resource)
        if name is None or not isinstance(resource, dict):
            return  # graph_importer.py:54-59
        body = resource[name]
        label = classify(name)
        key_field = "address" if label == "ip" else "name"
        me = (label, name)
        emit("v", label, name, props={key_field: name})  # :63-68

        for sub in body.get("observed-subdomains") or []:  # :70-77
            child = _resource_name(sub.get("domain"))
            if child is None:
                continue
            emit("v", "domain", child, props={"name": child})
            emit("e", src=me, dst=("domain", child), edge_label="observed")
            walk(sub.get("domain"))

        for resolve in body.get("dns-resolutions") or []:  # :79-94
            if label != "ip":
                child = _resource_name(resolve.get("ipaddress"))
                child_label = "ip"
                child_props = {"address": child}
                rec = resolve.get("ipaddress")
            else:
                child = _resource_name(resolve.get("domain"))
                child_label = "domain"
                child_props = {"name": child}
                rec = resolve.get("domain")
            if child is None:
                continue
            emit("v", child_label, child, props=child_props)
            emit("e", src=me, dst=(child_label, child), edge_label="assign",
                 props={"date": resolve.get("date")})
            walk(rec)

        # detections (:96-128) + the A1 detected_prop update (:131-138).
        # The ratio avg is computed VISIT-LOCALLY (a visit's detections
        # all live in this one report body — no distributed agg needed)
        # and emitted as an update row AT ITS REFERENCE POSITION: after
        # the detections, BEFORE whois/residuals. That preserves the
        # reference's ordering semantics exactly — a later visit of the
        # same resource wins, and a literal 'detected_prop' residual
        # field (applied later in the same visit, :153-168) overrides the
        # computed value. (A fixed-seq distributed aggregate averaged
        # ACROSS visits and beat residuals — both divergences.)
        ratios: list[float] = []
        for detect_element in LEGITIMATE_LIST + MALICIOUS_LIST:
            for detect in body.get(detect_element) or []:
                data_hash = detect.get("hash", "")
                data_time = detect.get("datetime", "")
                data_prob = detect.get("prob", "")
                try:  # B8 intent: malformed prob → skipped sample, not crash
                    detected, checker = map(int, str(data_prob).strip().split("/"))
                    if checker:
                        ratios.append(1.0 * detected / checker)
                except (ValueError, AttributeError):
                    pass
                vlabel = "legitimate" if detect_element in LEGITIMATE_LIST else "malicious"
                elabel = "trusted" if detect_element in LEGITIMATE_LIST else "threat"
                emit("v", vlabel, data_hash, props={
                    "hash": data_hash, "datetime": data_time, "probability": data_prob,
                })
                emit("e", src=me, dst=(vlabel, data_hash), edge_label=elabel)
        dp = (sum(ratios) / len(ratios)) if ratios else 0.0
        emit("u", label, name, props={"detected_prop": dp})

        # whois contacts (:141-151): owner vertex, belongTo owner→resource
        contacts = (body.get("whois") or {}).get("contacts") or {}
        for dept in ["admin", "tech", "registrant"]:
            contact = contacts.get(dept)
            if contact is not None and "email" in contact:
                emit("v", "owner", contact["email"], props=dict(contact))
                emit("e", src=("owner", contact["email"]), dst=me, edge_label="belongTo")

        # residual flattening (:153-168) — F5/F6/scalar → update-vertex
        for field, value in body.items():
            if field in NOT_BROWSE_FIELDS and field != name:
                continue
            if isinstance(value, list):
                emit("u", label, name, props={
                    f"{field}_{i}": v for i, v in enumerate(value)
                })
            elif isinstance(value, dict):
                emit("u", label, name, props={
                    f"{field}_{k}": v for k, v in value.items()
                })
            else:
                emit("u", label, name, props={field: value})

    walk(report)
    return rows


def staging_frame(spark: SparkSession, reports: DataFrame) -> DataFrame:
    """Arrow-batched parse: reports(ord bigint, value string-JSON) → long
    staging rows. Partition-local, no shuffle."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for ord_, raw in zip(pdf["ord"], pdf["value"]):
                try:
                    report = json.loads(raw)
                except (ValueError, TypeError):
                    # Dead-letter, don't poison-pill: one corrupt line must
                    # not kill a 100 TB ingest. Quarantined rows stay
                    # queryable via corrupt_records().
                    out.append((
                        int(ord_), 0, "x", None, None, None, None, None,
                        None, None, {"raw": str(raw)[:4096]}, None,
                    ))
                    continue
                if not isinstance(report, dict):
                    continue
                try:
                    out.extend(flatten_report(report, int(ord_)))
                except Exception:  # noqa: BLE001 — valid JSON, hostile shape
                    # (string body, scalar list entries, non-dict whois
                    # contact, ...): dead-letter like a parse failure —
                    # one malformed record must not kill a 100 TB ingest
                    out.append((
                        int(ord_), 0, "x", None, None, None, None, None,
                        None, None, {"raw": str(raw)[:4096]}, None,
                    ))
            yield pd.DataFrame(out, columns=_COLS)

    return reports.mapInPandas(parse, schema=STAGING_SCHEMA)


def corrupt_records(staging: DataFrame) -> DataFrame:
    """Quarantined unparseable inputs (kind='x'): (ord, raw prefix)."""
    return staging.filter(F.col("kind") == "x").select(
        "ord", F.col("props")["raw"].alias("raw")
    )


def _cmp_ord_seq(l, r):  # maps aren't orderable → compare (ord, seq) explicitly
    return (
        F.when(l["ord"] < r["ord"], -1)
        .when(l["ord"] > r["ord"], 1)
        .when(l["seq"] < r["seq"], -1)
        .when(l["seq"] > r["seq"], 1)
        .otherwise(0)
    )


def _set_fold(base_col, upds_col):
    """$set-fold an (ord,seq)-sorted array of update structs onto a base
    map: later keys win. Overwritten keys are dropped from the
    accumulator before concat — explicit so we don't depend on
    mapKeyDedupPolicy."""
    return F.when(upds_col.isNull(), base_col).otherwise(
        F.aggregate(
            upds_col,
            base_col,
            lambda acc, u: F.map_concat(
                F.map_filter(
                    acc, lambda k, _: ~F.array_contains(F.map_keys(u["props"]), k)
                ),
                u["props"],
            ),
        )
    )


def _update_folds(staging: DataFrame) -> DataFrame:
    """(label, key) → (ord,seq)-sorted array of update-kind props."""
    return (
        staging.filter(F.col("kind") == "u")
        # a NULL-props update is a no-op; letting it into the fold would
        # null the accumulator (map_concat(acc, NULL) = NULL)
        .filter(F.col("props").isNotNull())
        .groupBy("label", "key")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ord", "seq", "props")), _cmp_ord_seq
            ).alias("upds")
        )
    )


def update_props_frame(staging: DataFrame) -> DataFrame:
    """(id, props) of ONLY the update-kind staging rows, folded in
    (ord, seq) order with later keys winning.

    This is what the reference's re-import applies to an ALREADY-EXISTING
    vertex: insert_vertex on an existing vertex is a no-op
    (mongraph.py:90-97), so only the report's update_vertex calls
    (detected_prop, residual fields — graph_importer.py:131-168) land.
    Insert-origin props must never overwrite an existing vertex's values."""
    return _update_folds(staging).select(
        vertex_id(F.col("label"), F.col("key")).alias("id"),
        _set_fold(F.expr("map()").cast("map<string,string>"), F.col("upds")).alias(
            "props"
        ),
    )


def build_graph_tables(staging: DataFrame) -> PropertyGraph:
    """Staging rows → (vertices, edges), all JVM-side.

    - A1: detected_prop arrives as a normal update row emitted by the
      parser at its per-VISIT reference position (avg of parseable
      ratios, 0.0 when none — graph_importer.py:131-138 + B8 intent), so
      later visits overwrite earlier ones and a literal residual
      'detected_prop' field wins within a visit, exactly like the
      reference's update_vertex ordering.
    - vertex props: first insert wins, then updates fold left in
      (ord, seq) order with later keys winning ($set semantics).
    - edges: dedup on (src, dst, label), first occurrence's props win.

    The staging frame (Python JSON parse — the one genuinely expensive
    lineage here) is materialized EAGERLY for the duration of this call
    (optimization r14, the minhash-barrier discipline): the vertex and
    edge outputs are built by two CONCURRENT jobs, and against a lazy
    cold persist both race on the uncached staging blocks — measured
    4.3s vs 1.0s for the first 1000-report batch (block-lock waits +
    duplicated parse scheduling), and ~0.1s slower warm. Staging is
    released after both outputs checkpoint; the result blocks are
    graph-sized (≪ raw reports) and freed by Spark's ContextCleaner once
    the returned PropertyGraph is dereferenced.
    """
    staging = staging.localCheckpoint(eager=True)

    inserts = staging.filter(F.col("kind") == "v").select("label", "key", "ord", "seq", "props")

    base = inserts.groupBy("label", "key").agg(
        F.min_by("props", F.struct("ord", "seq")).alias("base_props")
    )
    upd = _update_folds(staging)
    vertices = (
        base.join(upd, on=["label", "key"], how="left")
        .select(
            vertex_id(F.col("label"), F.col("key")).alias("id"),
            "label",
            _set_fold(F.col("base_props"), F.col("upds")).alias("props"),
        )
    )

    edges = (
        staging.filter(F.col("kind") == "e")
        .select(
            vertex_id(F.col("src_label"), F.col("src_key")).alias("src"),
            vertex_id(F.col("dst_label"), F.col("dst_key")).alias("dst"),
            F.col("edge_label").alias("label"),
            "props", "ord", "seq",
        )
        .groupBy("src", "dst", "label")
        .agg(F.min_by("props", F.struct("ord", "seq")).alias("props"))
        .select(
            edge_id(F.col("src"), F.col("dst"), F.col("label")).alias("id"),
            "src", "dst", "label", "props",
        )
    )
    try:
        # independent DAGs — materialize the pair concurrently (both read
        # the persisted staging blocks; see session.run_concurrently)
        vertices, edges = run_concurrently(
            lambda: vertices.localCheckpoint(eager=True),
            lambda: edges.localCheckpoint(eager=True),
        )
    finally:
        staging.unpersist()
    return PropertyGraph(vertices, edges)


def import_from_json(spark: SparkSession, reports: list[dict] | DataFrame) -> PropertyGraph:
    """E1 entry point (graph_importer.py:170-175): reports → PropertyGraph.

    Accepts a list of report dicts (tests) or a DataFrame[ord, value]
    (``spark.read.text`` / streaming micro-batches).
    """
    if isinstance(reports, list):
        rows = [(i, json.dumps(r)) for i, r in enumerate(reports)]
        reports = spark.createDataFrame(rows, "ord bigint, value string")
    return build_graph_tables(staging_frame(spark, reports))
