"""Multimodal operator unit tests: the mapInPandas plumbing branches the
oracle gates (m70-m73) don't reach — the stub-decode fallback in resize,
NotImplementedError gates, and feature normalization invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongraph_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_features,
    resize_media,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta"), (3, "x" * 500)],
        "doc_id: long, text: string",
    )


def test_resize_falls_back_to_stub_decode_without_dims(spark):
    media = attach_fake_media(_docs(spark))  # no width/height/n_channels cols
    rows = {r["doc_id"]: r for r in resize_media(media, max_side=16).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert max(r["new_width"], r["new_height"]) <= 16
        assert r["out_bytes"] == r["new_width"] * r["new_height"] * r["n_channels"]
        assert len(bytes(r["resized"])) == r["out_bytes"]
        # aspect never upscaled
        assert r["new_width"] <= r["width"] and r["new_height"] <= r["height"]


def test_resize_respects_metadata_dims_over_stub(spark):
    media = attach_fake_media(_docs(spark)).withColumns(
        {"width": F.lit(64), "height": F.lit(16), "n_channels": F.lit(3)}
    )
    r = resize_media(media, max_side=32).filter(F.col("doc_id") == 1).first()
    assert (r["width"], r["height"]) == (64, 16)
    assert (r["new_width"], r["new_height"]) == (32, 8)  # floor aspect scale
    assert r["out_bytes"] == 32 * 8 * 3


def test_real_codecs_are_gated_not_silently_faked(spark):
    media = attach_fake_media(_docs(spark))
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)
    with pytest.raises(NotImplementedError):
        resize_media(media, fake=False)


def test_feature_histogram_sums_to_one(spark):
    media = attach_fake_media(_docs(spark))
    feats = extract_features(media, n_bins=16).collect()
    by_doc: dict[int, float] = {}
    for r in feats:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["value"]
        assert 0 <= r["bin"] < 16
    # 64 payload bytes, each in exactly one bin → fractions sum to 1
    for total in by_doc.values():
        assert abs(total - 1.0) < 1e-12
