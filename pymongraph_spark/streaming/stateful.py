"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.13 streaming row): per-user running statistics that
survive across micro-batches — the pattern for any accumulating
per-key state Spark's built-in aggregations can't express (e.g.
decayed counters, model features, anomaly baselines).

State is one pandas row per user: (n_events, total_value, max_value).
Timeout: event-time with watermark — idle users' state is dropped when
the watermark passes, bounding state size on unbounded keyspaces.

CHECKPOINT COMPATIBILITY: STATE_SCHEMA gained the `nv` field (non-null
value count, for SQL-NULL semantics on all-NULL groups) after the
original 3-field layout shipped. A streaming query restarted from a
checkpoint written under the old schema will misbind or fail on the
state tuples — resuming across this upgrade requires a FRESH checkpoint
location (state is rebuilt from the stream; same policy as any Spark
state-schema evolution without RocksDB schema-evolution support). The
tws.py state structs carry the same field and the same rule.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, nv bigint, total_micros bigint, mx double"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, nv, total_micros, mx = (
        state.get if state.exists else (0, 0, 0, float("-inf"))
    )
    for pdf in pdfs:
        n += len(pdf)
        # exact integer accumulation in 1e-6 units via floor(v*1e6 + 0.5)
        # — the identical IEEE multiply/add/floor the oracle's MICRO_SUM
        # template runs, so no engine can disagree on any value (numpy's
        # .round() was half-even on the product while the decimal-cast
        # oracle was half-up on the exact value — compat.py documents the
        # class). NULL values are skipped, exactly like SQL SUM/MAX.
        v = pdf["value"].dropna()
        if len(v):
            nv += len(v)
            total_micros += int(
                np.floor(v.to_numpy(dtype="float64") * 1_000_000.0 + 0.5)
                .astype("int64").sum()
            )
            mx = max(mx, float(v.max()))
    state.update((n, nv, total_micros, mx))
    # nv == 0 (no non-null value ever seen): SQL SUM/MAX yield NULL, so
    # emit None — not 0.0/-inf, which the oracle would reject
    yield pd.DataFrame(
        [{
            "user_id": user_id,
            "n_events": n,
            "total_value": total_micros / 1_000_000 if nv else None,
            "max_value": mx if nv else None,
        }]
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, ts, value) → continuously updated per-user
    running stats. Requires a watermark on ts upstream."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
