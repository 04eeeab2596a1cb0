"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libs are not in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (bytes → pseudo width/height/channel
stats derived from the payload hash) exercises the real Spark plumbing —
schema, batching, partitioning — end to end.

At 100 TB the pattern matters more than the codec: binary payloads ride in
parquet alongside metadata, ``mapInPandas`` streams Arrow batches through
Python once, and all filtering/joining happens JVM-side before decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, byte_len bigint"
)

DECODED_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, "
    "width int, height int, n_channels int, mean_intensity double"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic binary payload per doc (md5-derived) — stands in for
    a real image/audio blob column so the pipeline is testable here."""
    payload = F.unhex(F.repeat(F.md5(F.col(text_col)), 4))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("byte_len"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: metadata derived from payload hash."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    channels = 1 + h[2] % 3
    mean_intensity = sum(payload) / max(len(payload), 1) / 255.0
    return width, height, channels, mean_intensity


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode binary payloads to typed metadata via mapInPandas.

    Real decoders (PIL / torchaudio / av) plug in at the marked point;
    they are not available in this container, so only ``fake=True`` runs.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/av, not present in this "
            "container; pass fake=True to run the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_channels", "mean_intensity"]
            )
            yield pd.concat(
                [pdf[["doc_id", "media_type", "byte_len"]].reset_index(drop=True), out],
                axis=1,
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)
