"""Spark 4 Python Data Source (ingest/pyds.py): dead-letter semantics,
per-file partitioning, and option validation."""

from __future__ import annotations

import os

import pytest

from pymongraph_spark.ingest.pyds import (
    JsonlReportsReader,
    register_jsonl_reports,
)


def _write(path, name, lines):
    with open(os.path.join(path, name), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_dead_letter_preserves_every_line(spark, tmp_path):
    d = str(tmp_path)
    _write(d, "a.jsonl", ['{"doc_id": 1, "lang": "en", "n_chars": 10}',
                          'garbage line',
                          '{"doc_id": 2, "lang": "fr", "n_chars": 20}'])
    _write(d, "b.jsonl", ['{"doc_id": "NaN-ish"}', '', '[1,2,3]'])
    register_jsonl_reports(spark)
    rows = (
        spark.read.format("jsonl_reports").option("path", d).load()
        .collect()
    )
    ok = sorted((r["doc_id"], r["lang"], r["n_chars"]) for r in rows if r["_corrupt"] is None)
    bad = sorted(r["_corrupt"] for r in rows if r["_corrupt"] is not None)
    assert ok == [(1, "en", 10), (2, "fr", 20)]
    # every malformed line survives verbatim; blank lines are skipped
    assert bad == sorted(["[1,2,3]", '{"doc_id": "NaN-ish"}', "garbage line"])


def test_one_partition_per_file(tmp_path):
    d = str(tmp_path)
    for i in range(5):
        _write(d, f"f{i}.jsonl", ['{"doc_id": 1, "lang": "en", "n_chars": 1}'])
    _write(d, "_hidden", ["ignored"])
    reader = JsonlReportsReader({"path": d})
    parts = reader.partitions()
    assert len(parts) == 5
    assert sorted(os.path.basename(p.path) for p in parts) == [f"f{i}.jsonl" for i in range(5)]


def test_missing_path_option_raises():
    with pytest.raises(ValueError, match="path"):
        JsonlReportsReader({})


def test_writer_roundtrip_and_success_manifest(spark, tmp_path):
    """df.write.format('jsonl_reports') → read back through the reader:
    full fidelity, one part file per task, _SUCCESS lists every part."""
    d = str(tmp_path / "out")
    register_jsonl_reports(spark)
    df = spark.createDataFrame(
        [(1, "en", 10, None), (2, "fr", 20, None), (3, "de", 30, None)],
        "doc_id: long, lang: string, n_chars: long, _corrupt: string",
    ).repartition(2)
    df.write.format("jsonl_reports").option("path", d).mode("append").save()

    back = spark.read.format("jsonl_reports").option("path", d).load()
    got = sorted((r["doc_id"], r["lang"], r["n_chars"]) for r in back.collect())
    assert got == [(1, "en", 10), (2, "fr", 20), (3, "de", 30)]
    assert all(r["_corrupt"] is None for r in back.collect())

    with open(os.path.join(d, "_SUCCESS")) as fh:
        manifest = dict(line.split("\t") for line in fh.read().splitlines())
    assert sum(int(v) for v in manifest.values()) == 3
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    assert sorted(parts) == sorted(manifest)
