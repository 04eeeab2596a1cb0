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


FRAME_BYTES = 16

SAMPLED_FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_mean double"


def attach_fake_video(
    docs: DataFrame, n_frames: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic multi-frame binary payload: frame i is the 16 md5
    bytes of ``text#i``, concatenated — distinct per frame, so sampling
    is observable. Stands in for a real video blob column."""
    payload = F.unhex(
        F.concat(
            *[
                F.md5(F.concat(F.col(text_col), F.lit(f"#{i}")))
                for i in range(n_frames)
            ]
        )
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("video/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("byte_len"),
        F.lit(n_frames).cast("int").alias("n_frames"),
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th fixed-size frame from the payload via
    mapInPandas — one Arrow pass, one output row per sampled frame
    (doc_id, frame_idx, frame_mean). The real frame decoder (av) plugs
    into the marked slice; partitioning/batching/schema are the
    production shape.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_mean = [], [], []
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                p = bytes(payload)
                for i in range(0, int(n_frames), every_k):
                    frame = p[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]  # <- real decode here
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_mean.append(sum(frame) / len(frame) / 255.0)
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_mean": out_mean}
            )

    return media.mapInPandas(batches, schema=SAMPLED_FRAME_SCHEMA)
