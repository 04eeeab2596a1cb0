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
    # decoders: the registry always holds the stdlib WAV codec, so the
    # gate for an UNMATCHED media type ('image/fake') is a loud per-row
    # failure at decode, never a silent fake fallback
    with pytest.raises(Exception, match="no decoder registered"):
        decode_media(media, fake=False).collect()
    # resizers: nothing auto-registers in this container → hard gate
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


def test_codec_registry_injects_real_decoder(spark):
    """A decoder registered for a media_type prefix makes fake=False work
    end-to-end through the same mapInPandas plumbing — the seam a user
    with PIL/av plugs into."""
    from pymongraph_spark.operators import multimodal as mm

    def toy_decode(payload, media_type):
        return len(payload) % 100, 7, 2, 0.5

    def toy_resize(payload, w, h, c, nw, nh):
        return bytes([1, 2, 3]) * nw * nh

    mm.register_decoder("image/", toy_decode)
    mm.register_resizer("image/", toy_resize)
    try:
        media = attach_fake_media(_docs(spark))  # media_type 'image/fake'
        got = {r["doc_id"]: r for r in mm.decode_media(media, fake=False).collect()}
        assert got[1]["width"] == 64 % 100 and got[1]["height"] == 7
        assert got[1]["n_channels"] == 2 and got[1]["mean_intensity"] == 0.5

        rr = {r["doc_id"]: r for r in mm.resize_media(media, fake=False).collect()}
        for r in rr.values():
            assert bytes(r["resized"])[:3] == bytes([1, 2, 3])
            assert r["out_bytes"] == len(bytes(r["resized"]))
    finally:
        mm.unregister_codec("image/")
    # gate restored once the codec is gone (the always-present WAV codec
    # doesn't match image/*, so the failure is per-row and loud)
    with pytest.raises(Exception, match="no decoder registered"):
        mm.decode_media(attach_fake_media(_docs(spark)), fake=False).collect()


def test_codec_registry_longest_prefix_and_missing_type(spark):
    from pymongraph_spark.operators import multimodal as mm

    generic = lambda p, mt: (1, 1, 1, 0.0)  # noqa: E731
    specific = lambda p, mt: (9, 9, 9, 0.9)  # noqa: E731
    mm.register_decoder("image/", generic)
    mm.register_decoder("image/fake", specific)
    try:
        assert mm._resolve(dict(mm._DECODERS), "image/fake") is specific
        assert mm._resolve(dict(mm._DECODERS), "image/png") is generic
        assert mm._resolve(dict(mm._DECODERS), "audio/wav") is mm._wav_decode
        assert mm._resolve(dict(mm._DECODERS), "video/mp4") is None
        # an unregistered media_type fails loudly inside the batch fn
        media = attach_fake_media(_docs(spark)).withColumn(
            "media_type", F.lit("video/mp4")
        )
        with pytest.raises(Exception, match="no decoder registered"):
            mm.decode_media(media, fake=False).collect()
    finally:
        mm.unregister_codec("image/")
        mm.unregister_codec("image/fake")


def test_wav_decoder_is_real(spark):
    """The stdlib-wave codec parses genuine RIFF containers: 8-bit mono
    from attach_wav_audio end-to-end through fake=False, and 16-bit
    stereo through the decoder directly."""
    import io
    import struct
    import wave

    from pymongraph_spark.operators import multimodal as mm

    # end-to-end through Spark: synth → registry resolve → decode
    audio = mm.attach_wav_audio(_docs(spark), n_samples=64, rate=8000)
    got = {r["doc_id"]: r for r in mm.decode_media(audio, fake=False).collect()}
    for doc_id, r in got.items():
        assert (r["width"], r["height"], r["n_channels"]) == (8000, 64, 1)
        exp = sum(abs(((doc_id * 31 + i * 7) % 256) - 128) / 128.0 for i in range(64)) / 64
        assert r["mean_intensity"] == exp  # exact: k/128 sums are lossless
        assert r["byte_len"] == 108  # 44-byte RIFF header + 64 PCM bytes

    # 16-bit stereo direct: 2 channels × 3 frames of known signed samples
    samples = [1000, -1000, 32767, -32768, 0, 16384]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<6h", *samples))
    rate, nframes, nch, mean = mm._wav_decode(buf.getvalue(), "audio/wav")
    assert (rate, nframes, nch) == (44100, 3, 2)
    assert mean == sum(abs(s) / 32768.0 for s in samples) / 6

    # corrupt container fails loudly, never fakes
    with pytest.raises(Exception):
        mm._wav_decode(b"not a riff file at all", "audio/wav")


def _bmp_bytes(width, height, pix, top_down=False):
    """Hand-rolled 24-bit BMP encoder for decoder tests: ``pix(x, y)``
    gives the gray value at top-down coordinates."""
    import struct

    row_size = ((width * 3 + 3) // 4) * 4
    pad = b"\xab" * (row_size - width * 3)  # non-zero pad: must be excluded
    img_size = row_size * height
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height if not top_down else -height,
        1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    ys = range(height) if top_down else range(height - 1, -1, -1)
    rows = []
    for y in ys:
        row = bytearray()
        for x in range(width):
            v = pix(x, y)
            row += bytes((v, v, v))
        rows.append(bytes(row) + pad)
    return header + b"".join(rows)


def test_bmp_decoder_excludes_row_padding():
    from pymongraph_spark.operators.multimodal import _bmp_decode

    # width 3 → 9 pixel bytes padded to 12 per row; pad bytes are 0xab
    # and would shift the mean if ever counted
    payload = _bmp_bytes(3, 2, lambda x, y: 10 * (y * 3 + x))
    w, h, c, mean = _bmp_decode(payload, "image/bmp")
    assert (w, h, c) == (3, 2, 3)
    assert mean == sum(10 * i for i in range(6)) / 6 / 256.0


def test_bmp_decoder_handles_topdown_negative_height():
    from pymongraph_spark.operators.multimodal import _bmp_decode

    pix = lambda x, y: (7 * x + 13 * y) % 256  # noqa: E731
    up = _bmp_bytes(4, 4, pix, top_down=False)
    down = _bmp_bytes(4, 4, pix, top_down=True)
    assert _bmp_decode(up, "image/bmp") == _bmp_decode(down, "image/bmp")


def test_bmp_decoder_rejects_malformed_payloads():
    import struct

    from pymongraph_spark.operators.multimodal import _bmp_decode

    with pytest.raises(ValueError, match="BM"):
        _bmp_decode(b"PNG" + b"\x00" * 60, "image/bmp")
    # valid magic but 32-bpp: loud gate, not a wrong answer
    good = _bmp_bytes(2, 2, lambda x, y: 0)
    bad_bpp = good[:28] + struct.pack("<H", 32) + good[30:]
    with pytest.raises(ValueError, match="unsupported"):
        _bmp_decode(bad_bpp, "image/bmp")


def test_attach_bmp_image_decodes_through_registry(spark):
    from pymongraph_spark.operators.multimodal import attach_bmp_image

    media = attach_bmp_image(_docs(spark))
    r = {row["doc_id"]: row for row in decode_media(media, fake=False).collect()}
    assert set(r) == {1, 2, 3}
    for d, row in r.items():
        assert (row["width"], row["height"], row["n_channels"]) == (8, 8, 3)
        assert row["byte_len"] == 54 + 8 * 8 * 3
        expected = sum(((d * 13 + i * 5) % 256) / 256.0 for i in range(64)) / 64
        assert row["mean_intensity"] == expected


def test_dhash_invariant_to_container_layout(spark):
    """dHash must depend on PIXELS, not bytes: the same image stored
    bottom-up (positive height) and top-down (negative height) has
    byte-identical rows in opposite order but must hash identically."""
    import struct

    from pymongraph_spark.operators.multimodal import _bmp_gray_pixels, dhash_media

    w = h = 8
    row_size = ((w * 3 + 3) // 4) * 4
    pad = b"\x00" * (row_size - w * 3)
    img_size = row_size * h

    def bmp(top_down: bool):
        header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54) + struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        rows = []
        ys = range(h) if top_down else range(h - 1, -1, -1)
        for y in ys:
            row = bytearray()
            for x in range(w):
                v = (7 * (y * w + x) + 3) % 256
                row += bytes((v, v, v))
            rows.append(bytes(row) + pad)
        return header + b"".join(rows)

    up, down = bmp(False), bmp(True)
    assert up != down  # different byte layouts
    assert _bmp_gray_pixels(up) == _bmp_gray_pixels(down)  # same image

    media = spark.createDataFrame(
        [(1, "image/bmp", bytearray(up), len(up)), (2, "image/bmp", bytearray(down), len(down))],
        "doc_id: long, media_type: string, payload: binary, byte_len: long",
    )
    hashes = {r["doc_id"]: r["dhash"] for r in dhash_media(media).collect()}
    assert hashes[1] == hashes[2]


def test_dhash_rejects_oversized_and_non_bmp(spark):
    from pymongraph_spark.operators.multimodal import dhash_media

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(b"\x89PNG...."), 8)],
        "doc_id: long, media_type: string, payload: binary, byte_len: long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="BMP"):
        dhash_media(media).collect()


def test_dhash_full_64bit_budget_top_bit_set(spark):
    """The documented 8x9 crop uses bit index 63 (9 rows × 8 adjacent
    pairs = 64 bits). A set top bit must land as the signed int64
    reinterpretation, not crash with OverflowError (ADVICE r5 #2) —
    and an 8x10 must still be rejected as over budget."""
    from pymongraph_spark.operators.multimodal import dhash_media

    # classic dHash geometry: 9 wide × 8 tall → 8 rows × 8 adjacent
    # pairs = exactly 64 bits. Every row strictly descending along x →
    # every comparison true → all 64 bits set, including bit 63.
    img = _bmp_bytes(9, 8, lambda x, y: 255 - x * 10)
    media = spark.createDataFrame(
        [(1, "image/bmp", bytearray(img), len(img))],
        "doc_id: long, media_type: string, payload: binary, byte_len: long",
    )
    row = dhash_media(media).collect()[0]
    assert (row["width"], row["height"]) == (9, 8)
    assert row["dhash"] == -1  # all 64 bits set, two's-complement

    too_big = _bmp_bytes(9, 9, lambda x, y: 255 - x * 10)
    media2 = spark.createDataFrame(
        [(2, "image/bmp", bytearray(too_big), len(too_big))],
        "doc_id: long, media_type: string, payload: binary, byte_len: long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="budget"):
        dhash_media(media2).collect()
