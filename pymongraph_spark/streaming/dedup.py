"""Streaming dedup with bounded state: dropDuplicatesWithinWatermark
keeps only the keys seen within the watermark horizon, so state doesn't
grow with the full stream history — the streaming analogue of the batch
exact-dedup tier (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def deduped_event_stream(events_stream: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Drop duplicate events (same key columns) arriving within the
    watermark window. Requires a watermark on ts upstream."""
    keys = keys or ["event_id"]
    return events_stream.dropDuplicatesWithinWatermark(keys)
