"""Custom stateful streaming via Spark 4's transformWithStateInPandas —
the successor API to applyInPandasWithState (streaming/stateful.py keeps
the classic form): a StatefulProcessor owns named, typed state handles
(ValueState here; ListState/MapState and timers are the same surface)
instead of one opaque per-key tuple, and state survives across
micro-batches under the state store's fault-tolerance guarantees.

Per event_type running stats: (n_events, total on the 1e-6 decimal grid,
min, max). The decimal-grid total makes the final state equal the batch
aggregate bit-for-bit regardless of arrival order — the same exactness
contract as streaming/stateful.py, so a DuckDB oracle can check the
whole streaming path.

CHECKPOINT COMPATIBILITY: the state struct gained the `nv` field after
the original layout; restarting from a checkpoint written under the old
struct misbinds the tuple — use a FRESH checkpoint location across this
upgrade (see streaming/stateful.py's docstring for the policy).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, total_value double, "
    "min_value double, max_value double"
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("nv", LongType()),
        StructField("total_micros", LongType()),
        StructField("mn", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


class RunningTypeStats(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if self._stats.exists():
            n, nv, total_micros, mn, mx = self._stats.get()
        else:
            n, nv, total_micros, mn, mx = 0, 0, 0, float("inf"), float("-inf")
        for pdf in rows:
            n += len(pdf)
            # floor(v*1e6 + 0.5) in 1e-6 units — identical IEEE ops to the
            # oracle's MICRO_SUM template (see streaming/stateful.py and
            # compat.py for why the decimal-cast route could disagree);
            # NULLs skipped like SQL SUM/MIN/MAX
            v = pdf["value"].dropna()
            if len(v):
                nv += len(v)
                total_micros += int(
                    np.floor(v.to_numpy(dtype="float64") * 1_000_000.0 + 0.5)
                    .astype("int64").sum()
                )
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        self._stats.update((n, nv, total_micros, mn, mx))
        # nv == 0: SQL SUM/MIN/MAX over no non-null values are NULL —
        # emit None, never 0.0/inf/-inf
        yield pd.DataFrame(
            [{
                "event_type": event_type,
                "n_events": n,
                "total_value": total_micros / 1_000_000 if nv else None,
                "min_value": mn if nv else None,
                "max_value": mx if nv else None,
            }]
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; this container ships pyspark without it, so the API is
    probed like the other optional runtimes (Delta, GraphFrames) and
    callers route to the classic applyInPandasWithState formulation
    when absent. The worker crash without this probe is opaque
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), so fail early."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_type_stats_tws(events_stream: DataFrame) -> DataFrame:
    """events stream (event_type, value) → per-type running stats via
    transformWithStateInPandas. timeMode='None': state lives for the
    query's lifetime (5 bounded keys here); production unbounded
    keyspaces would use event-time timers to expire idle keys."""
    return events_stream.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningTypeStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def running_type_stats_classic(events_stream: DataFrame) -> DataFrame:
    """Semantics-identical fallback on the classic applyInPandasWithState
    API (no protobuf dependency): same decimal-grid accumulation, same
    output schema, so the oracle holds on either route."""
    from typing import Any, Iterator, Tuple

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, nv, total_micros, mn, mx = state.get
        else:
            n, nv, total_micros, mn, mx = 0, 0, 0, float("inf"), float("-inf")
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].dropna()  # same quantization contract as above
            if len(v):
                nv += len(v)
                total_micros += int(
                    np.floor(v.to_numpy(dtype="float64") * 1_000_000.0 + 0.5)
                    .astype("int64").sum()
                )
                mn = min(mn, float(v.min()))
                mx = max(mx, float(v.max()))
        state.update((n, nv, total_micros, mn, mx))
        yield pd.DataFrame(
            [{
                "event_type": event_type,
                "n_events": n,
                "total_value": total_micros / 1_000_000 if nv else None,
                "min_value": mn if nv else None,
                "max_value": mx if nv else None,
            }]
        )

    return events_stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="n bigint, nv bigint, total_micros bigint, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_type_stats(events_stream: DataFrame) -> DataFrame:
    """Route to the Spark 4 API when its runtime dependency exists,
    else the classic one — callers get identical results either way."""
    if tws_available():
        return running_type_stats_tws(events_stream)
    return running_type_stats_classic(events_stream)
