"""Custom batch source via the Spark 4 Python Data Source API: JSONL
report files with DEAD-LETTER semantics — malformed lines become rows
with a populated ``_corrupt`` column instead of killing the job or being
silently dropped (the same contract as ingest/importer's dead-letter
channel, now surfaced as a first-class ``spark.read.format(...)``).

Why a custom source instead of spark.read.json + columnNameOfCorruptRecord:
the built-in JSON reader makes corrupt-record capture awkward under
schema inference and silently NULLs type mismatches; this source gives
the ingest layer an explicit, testable policy — valid row XOR dead
letter, nothing dropped — while keeping Spark's scheduling: one input
partition per file, so a directory of N files reads with N-way
parallelism and each executor parses only its own split.

Registration is per-session: ``register_jsonl_reports(spark)``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

REPORT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("n_chars", LongType()),
        StructField("_corrupt", StringType()),
    ]
)

_FIELDS = [f.name for f in REPORT_SCHEMA.fields if f.name != "_corrupt"]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReportsReader(DataSourceReader):
    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("jsonl_reports requires a 'path' option")

    def partitions(self):
        # one partition per data file — Spark schedules them in parallel
        # and a file never straddles executors (JSONL lines are the
        # atomic unit, so per-file splits need no record-boundary logic)
        return [
            _FilePartition(os.path.join(self._dir, f))
            for f in sorted(os.listdir(self._dir))
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line.strip():
                    continue
                try:
                    rec = json.loads(line)
                    if not isinstance(rec, dict):
                        raise ValueError("not an object")
                    yield (
                        int(rec["doc_id"]),
                        str(rec["lang"]),
                        int(rec["n_chars"]),
                        None,
                    )
                except (ValueError, KeyError, TypeError):
                    # dead letter: full raw line, typed fields NULL —
                    # nothing is dropped, nothing kills the scan
                    yield (None, None, None, line)


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlReportsWriter(DataSourceWriter):
    """Write side of the source: each task streams its partition to a
    uniquely-named part file (uuid — concurrent tasks and task RETRIES
    never collide), and the driver-side commit() publishes a _SUCCESS
    marker naming every committed part. Readers (partitions() above)
    skip underscore files, and register_bucketed_external-style
    consumers treat a missing _SUCCESS as an interrupted write — the
    same torn-write discipline the rest of the repo uses."""

    def __init__(self, options: dict):
        self._dir = options.get("path")
        if not self._dir:
            raise ValueError("jsonl_reports requires a 'path' option")

    def write(self, iterator) -> _FileCommit:
        import uuid

        os.makedirs(self._dir, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self._dir, name)
        n = 0
        with open(full, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = {f: row[f] for f in _FIELDS}
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
                n += 1
        return _FileCommit(name, n)

    def commit(self, messages) -> None:
        with open(os.path.join(self._dir, "_SUCCESS"), "w", encoding="utf-8") as fh:
            for m in messages:
                fh.write(f"{m.path}\t{m.n_rows}\n")

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self._dir, m.path))
            except OSError:
                pass


class JsonlReportsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_reports"

    def schema(self):
        return REPORT_SCHEMA

    def reader(self, schema) -> JsonlReportsReader:
        return JsonlReportsReader(self.options)

    def writer(self, schema, overwrite: bool) -> JsonlReportsWriter:
        if overwrite:
            import shutil

            shutil.rmtree(self.options.get("path", ""), ignore_errors=True)
        return JsonlReportsWriter(self.options)


def register_jsonl_reports(spark) -> None:
    """Idempotent per-session registration of the custom source."""
    spark.dataSource.register(JsonlReportsDataSource)
