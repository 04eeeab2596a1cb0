"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Real codecs plug in through a per-media-type registry
(``register_decoder`` / ``register_resizer``, longest-prefix match on the
``media_type`` column, e.g. ``"image/"`` or ``"image/png"``). At import,
``_probe_default_codecs`` auto-registers PIL-backed callables when PIL is
importable — so image ``fake=False`` works the moment the codec libs
exist, with zero engine-code changes — and ALWAYS registers a real WAV
decoder built on the stdlib ``wave`` module (``audio/wav``), so one
genuine container-parsing codec runs in any environment. For media types
with no registered codec, ``fake=False`` raises and ``fake=True`` runs a
deterministic fake decoder (bytes → pseudo width/height/channel stats
derived from the payload hash) that exercises the real Spark plumbing —
schema, batching, partitioning — end to end.

At 100 TB the pattern matters more than the codec: binary payloads ride in
parquet alongside metadata, ``mapInPandas`` streams Arrow batches through
Python once, and all filtering/joining happens JVM-side before decode.
Registered callables are captured into the mapInPandas closure by
cloudpickle, so plain functions, lambdas, and bound methods all ship to
executors without any registration step on the cluster side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decoder: (payload, media_type) -> (width, height, n_channels, mean_intensity)
DecoderFn = Callable[[bytes, str], tuple[int, int, int, float]]
# resizer: (payload, w, h, c, new_w, new_h) -> resized payload bytes
ResizerFn = Callable[[bytes, int, int, int, int, int], bytes]

_DECODERS: dict[str, DecoderFn] = {}
_RESIZERS: dict[str, ResizerFn] = {}


def register_decoder(media_type_prefix: str, fn: DecoderFn) -> None:
    """Register a decoder for media types starting with ``media_type_prefix``
    (longest registered prefix wins at decode time)."""
    _DECODERS[media_type_prefix] = fn


def register_resizer(media_type_prefix: str, fn: ResizerFn) -> None:
    _RESIZERS[media_type_prefix] = fn


def unregister_codec(media_type_prefix: str) -> None:
    _DECODERS.pop(media_type_prefix, None)
    _RESIZERS.pop(media_type_prefix, None)


def available_codecs() -> dict[str, list[str]]:
    return {"decoders": sorted(_DECODERS), "resizers": sorted(_RESIZERS)}


def _resolve(registry: dict[str, Callable], media_type: str) -> Callable | None:
    best_prefix, best_fn = None, None
    for prefix, fn in registry.items():
        if media_type.startswith(prefix) and (
            best_prefix is None or len(prefix) > len(best_prefix)
        ):
            best_prefix, best_fn = prefix, fn
    return best_fn


def _pil_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(payload))
    stat = ImageStat.Stat(img)
    mean = sum(stat.mean) / len(stat.mean) / 255.0
    return img.width, img.height, len(img.getbands()), mean


def _pil_resize(payload: bytes, w: int, h: int, c: int, nw: int, nh: int) -> bytes:
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload)).resize((nw, nh)).tobytes()


def _wav_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """REAL audio decoder over the stdlib ``wave`` module — parses the
    RIFF container and PCM frames, no external codec libs needed. The
    decoder tuple is documented per modality: for audio,
    ``width`` = sample rate (Hz), ``height`` = frames per channel,
    ``n_channels`` = channels, ``mean_intensity`` = mean |amplitude|
    normalized to [0, 1] (8-bit PCM is unsigned midpoint-128; 16-bit is
    signed little-endian)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        nch = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sampwidth == 1:
        amps = [abs(b - 128) / 128.0 for b in raw]
    elif sampwidth == 2:
        vals = struct.unpack(f"<{len(raw) // 2}h", raw)
        amps = [abs(v) / 32768.0 for v in vals]
    else:
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    mean = sum(amps) / len(amps) if amps else 0.0
    return rate, nframes, nch, mean


def _bmp_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """REAL image decoder for uncompressed 24-bit BMP — a genuine
    BITMAPFILEHEADER/BITMAPINFOHEADER container parse in pure stdlib
    ``struct``, no codec libs needed. Validates the 'BM' magic, honors
    the header's pixel-data offset, 4-byte row padding, and bottom-up vs
    top-down row order (negative height). ``mean_intensity`` is the mean
    over all channel bytes normalized by 256 (a power of two, so sums of
    byte/256 terms are exact in doubles in any order — same rationale as
    the 8-bit WAV path's /128)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit handled"
        )
    height = abs(height_raw)
    row_size = ((width * 3 + 3) // 4) * 4
    total, count = 0, 0
    for r in range(height):
        off = data_offset + r * row_size
        row = payload[off : off + width * 3]  # exclude the padding bytes
        total += sum(row)
        count += len(row)
    mean = total / count / 256.0 if count else 0.0
    return width, height, 3, mean


def _probe_default_codecs() -> None:
    """Auto-register codec-lib-backed callables for whatever is importable.
    Called at import; safe to re-run (idempotent) after installing libs."""
    try:
        import PIL  # noqa: F401

        _DECODERS.setdefault("image/", _pil_decode)
        _RESIZERS.setdefault("image/", _pil_resize)
    except ImportError:
        pass
    # stdlib wave is always importable — WAV decode is REAL in any env
    _DECODERS.setdefault("audio/wav", _wav_decode)
    _DECODERS.setdefault("audio/x-wav", _wav_decode)
    # stdlib struct likewise — 24-bit BMP decode is REAL in any env, and
    # longest-prefix resolution routes image/bmp here even when the
    # generic PIL "image/" decoder is also registered
    _DECODERS.setdefault("image/bmp", _bmp_decode)


_probe_default_codecs()

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
    # coalesce: a NULL text would make the payload NULL and crash the
    # Arrow decode batch (bytes(None)); the oracles coalesce identically
    payload = F.unhex(F.repeat(F.md5(F.coalesce(F.col(text_col), F.lit(""))), 4))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("byte_len"),
    )


def attach_wav_audio(
    docs: DataFrame,
    n_samples: int = 64,
    rate: int = 8000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach a GENUINE RIFF/WAV payload per doc (mono 8-bit PCM at
    ``rate`` Hz): sample i of doc d is ``(d*31 + i*7) % 256``. The bytes
    go through the stdlib ``wave`` writer, so downstream ``fake=False``
    decoding exercises a real container parse — while the sample formula
    keeps every decoded statistic recomputable in ANSI SQL (each
    |amplitude| is k/128 with k ≤ 128, so sums are exact in doubles and
    the oracle match is bit-for-bit)."""
    import io
    import wave

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                pcm = bytes((d * 31 + i * 7) % 256 for i in range(n_samples))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(1)
                    w.setframerate(rate)
                    w.writeframes(pcm)
                payloads.append(buf.getvalue())
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "audio/wav",
                    "payload": payloads,
                }
            )
            out["byte_len"] = [len(p) for p in payloads]
            yield out

    return docs.select(F.col(id_col)).mapInPandas(batches, schema=MEDIA_SCHEMA)


def attach_bmp_image(
    docs: DataFrame,
    width: int = 8,
    height: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach a GENUINE uncompressed 24-bit BMP payload per doc: pixel i
    (row-major, top-down) of doc d is the gray value ``(d*13 + i*5) % 256``
    replicated across B/G/R. The container is written spec-correct
    (bottom-up rows, 4-byte row padding, 54-byte header) so ``fake=False``
    decoding exercises a real image container parse — while the pixel
    formula keeps the decoded mean recomputable in ANSI SQL (each byte/256
    is an exact double, so the mean matches bit-for-bit in any sum order)."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        row_size = ((width * 3 + 3) // 4) * 4
        pad = b"\x00" * (row_size - width * 3)
        img_size = row_size * height
        header = b"BM" + struct.pack(
            "<IHHI", 14 + 40 + img_size, 0, 0, 54
        ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                d = int(doc_id)
                rows = []
                # BMP stores rows bottom-up; pixel index stays top-down
                for y in range(height - 1, -1, -1):
                    row = bytearray()
                    for x in range(width):
                        v = (d * 13 + (y * width + x) * 5) % 256
                        row += bytes((v, v, v))
                    rows.append(bytes(row) + pad)
                payloads.append(header + b"".join(rows))
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": "image/bmp",
                    "payload": payloads,
                }
            )
            out["byte_len"] = [len(p) for p in payloads]
            yield out

    return docs.select(F.col(id_col)).mapInPandas(batches, schema=MEDIA_SCHEMA)


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

    ``fake=False`` resolves a registered decoder per row's ``media_type``
    (register via ``register_decoder``; PIL auto-registers for ``image/``
    when importable). The registry is snapshotted driver-side into the
    closure, so executors need no registration step.
    """
    if not fake:
        decoders = dict(_DECODERS)
        if not decoders:
            # only reachable if every default codec (incl. stdlib WAV) was
            # explicitly unregistered; unmatched media types otherwise fail
            # per-row inside the batch fn below
            raise NotImplementedError(
                "decoder registry is empty; register_decoder() one, or pass "
                "fake=True for the deterministic stub"
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                decoded = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            else:
                decoded = []
                for p, mt in zip(pdf["payload"], pdf["media_type"]):
                    fn = _resolve(decoders, mt)
                    if fn is None:
                        raise ValueError(
                            f"no decoder registered for media_type {mt!r}; "
                            f"registered prefixes: {sorted(decoders)}"
                        )
                    decoded.append(fn(bytes(p), mt))
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
                F.md5(F.concat(F.coalesce(F.col(text_col), F.lit("")), F.lit(f"#{i}")))
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


RESIZED_SCHEMA = (
    "doc_id bigint, width int, height int, n_channels int, "
    "new_width int, new_height int, out_bytes bigint, resized binary"
)


def resize_media(media: DataFrame, max_side: int = 32, fake: bool = True) -> DataFrame:
    """Resize payloads so the longer side becomes ``max_side`` (aspect
    preserved, never upscaled) via mapInPandas. Dimension math is pure
    integer arithmetic — floor-scaled, min 1 — so the metadata is exact
    and cross-engine checkable. ``fake=False`` resolves a registered
    resizer per row's ``media_type`` (register via ``register_resizer``;
    PIL auto-registers for ``image/`` when importable); ``fake=True``
    stands in with a truncate/pad to the computed byte budget so a REAL
    binary column flows out with the production schema either way.
    """
    if not fake:
        resizers = dict(_RESIZERS)
        if not resizers:
            raise NotImplementedError(
                "no resizers registered (codec libs like PIL are not in this "
                "container); register_resizer() one, or pass fake=True for "
                "the deterministic stub"
            )

    # dimensions come from metadata columns when the frame carries them
    # (the production case: dims are stored alongside the blob at ingest,
    # so resize planning never needs a decode); the stub decoder is the
    # fallback for bare (doc_id, payload) frames.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            has_dims = {"width", "height", "n_channels"}.issubset(pdf.columns)
            rows = []
            for j, (doc_id, payload) in enumerate(zip(pdf["doc_id"], pdf["payload"])):
                p = bytes(payload)
                if has_dims:
                    w = int(pdf["width"].iloc[j])
                    h = int(pdf["height"].iloc[j])
                    c = int(pdf["n_channels"].iloc[j])
                else:
                    w, h, c, _ = _fake_decode(p)
                longest = max(w, h)
                if longest <= max_side:
                    nw, nh = w, h
                else:
                    nw = max(1, (w * max_side) // longest)
                    nh = max(1, (h * max_side) // longest)
                if fake:
                    out_bytes = nw * nh * c
                    resized = (p * (out_bytes // max(len(p), 1) + 1))[:out_bytes]
                else:
                    mt = str(pdf["media_type"].iloc[j]) if "media_type" in pdf.columns else ""
                    fn = _resolve(resizers, mt)
                    if fn is None:
                        raise ValueError(
                            f"no resizer registered for media_type {mt!r}; "
                            f"registered prefixes: {sorted(resizers)}"
                        )
                    resized = fn(p, w, h, c, nw, nh)
                    out_bytes = len(resized)
                rows.append((doc_id, w, h, c, nw, nh, out_bytes, resized))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "new_width", "new_height", "out_bytes", "resized",
                ],
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, bin int, value double"


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Byte-histogram feature extraction: each payload → ``n_bins``
    normalized bins in LONG format (doc_id, bin, value) — the layout that
    avoids nested arrays in outputs and joins/aggregates cleanly. A real
    embedding model replaces the histogram at the marked line; the Arrow
    batching, long-format explosion and exact count/len division are the
    production shape.
    """
    shift = 8 - (n_bins - 1).bit_length()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bins, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                counts = [0] * n_bins
                for b in p:  # <- real feature extractor here
                    counts[b >> shift] += 1
                n = max(len(p), 1)
                for i, cnt in enumerate(counts):
                    ids.append(doc_id)
                    bins.append(i)
                    vals.append(cnt / n)
            yield pd.DataFrame({"doc_id": ids, "bin": bins, "value": vals})

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def _bmp_gray_pixels(payload: bytes) -> list[int]:
    """Row-major (top-down) grayscale pixels from an uncompressed 24-bit
    BMP — the same genuine container parse as _bmp_decode (magic, data
    offset, padding, bottom-up vs top-down), returning the blue-channel
    byte per pixel (our generators write gray, B=G=R; a real grayscale
    conversion would be a weighted sum here)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or compression != 0 or bpp != 24:
        raise ValueError("only uncompressed 24-bit BMP handled")
    height = abs(height_raw)
    bottom_up = height_raw > 0
    row_size = ((width * 3 + 3) // 4) * 4
    pixels: list[int] = []
    for r in range(height):
        src_row = (height - 1 - r) if bottom_up else r
        off = data_offset + src_row * row_size
        row = payload[off : off + width * 3]
        pixels.extend(row[0::3])  # one channel per pixel
    return pixels


def dhash_media(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual difference-hash over DECODED image payloads: bit (r,c)
    is 1 iff gray(r,c) > gray(r,c+1) — h*(w-1) bits packed row-major into
    a bigint (64-bit budget: up to 8x9 crops; classic dHash downsamples
    to that first, our 8x8 generators need no resample). Images that
    LOOK alike hash alike regardless of byte-level differences — the
    image-side analogue of simhash, and the same scale story: group or
    band on the hash (pigeonhole chunks for hamming-k), never pixel
    all-pairs. Returns (id, width, height, dhash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, hashes = [], [], [], []
            for doc_id, mt, payload in zip(
                pdf[id_col], pdf["media_type"], pdf["payload"]
            ):
                if not str(mt).startswith("image/bmp"):
                    raise ValueError(f"dhash_media needs BMP payloads, got {mt}")
                px = _bmp_gray_pixels(bytes(payload))
                import struct as _s

                w = _s.unpack_from("<i", bytes(payload), 18)[0]
                h = len(px) // w if w else 0
                if h * (w - 1) > 64:
                    raise ValueError(
                        f"{w}x{h} exceeds the 64-bit dhash budget; resize first"
                    )
                bits = 0
                k = 0
                for r in range(h):
                    base = r * w
                    for c in range(w - 1):
                        if px[base + c] > px[base + c + 1]:
                            bits |= 1 << k
                        k += 1
                # two's-complement wrap: at the full 64-bit budget (8x9
                # crop) bit 63 is legal, but a set top bit is >= 2^63 and
                # overflows the int64 column — store the signed
                # reinterpretation (hamming distance is unaffected; the
                # <= 63-bit cases, incl. our 8x8 generators, are unchanged)
                if bits >= 1 << 63:
                    bits -= 1 << 64
                ids.append(int(doc_id))
                ws.append(w)
                hs.append(h)
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(
        batches, schema=f"{id_col} bigint, width int, height int, dhash bigint"
    )


def wav_frame_energy(
    media: DataFrame,
    frame_size: int = 16,
    id_col: str = "doc_id",
    with_quantized_energy: bool = False,
) -> DataFrame:
    """Frame-level RMS energy over REAL WAV decode (the stdlib ``wave``
    container parse, same path as _wav_decode): each payload's PCM
    samples split into fixed frames, RMS per frame — the silence/VAD
    primitive of an audio curation pipeline. Amplitudes are k/128 exact
    dyadics and sqrt is IEEE correctly rounded, so frame energies are
    bit-identical across engines. Trailing partial frames are kept with
    their true sample count.

    ``with_quantized_energy`` adds an ``energy_q`` bigint column — the
    INTEGER sum of squared raw amplitude magnitudes (Σk² for 8-bit
    |b-128|, Σv² for 16-bit) — so downstream thresholding (voiced/
    silence classification) is pure integer comparison, immune to any
    float-boundary ambiguity. Kept optional so m77's gated schema is
    unchanged."""
    import io
    import math
    import struct
    import wave

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, ns, rms, eq = [], [], [], [], []
            for doc_id, mt, payload in zip(
                pdf[id_col], pdf["media_type"], pdf["payload"]
            ):
                if not str(mt).startswith("audio/wav"):
                    raise ValueError(f"wav_frame_energy needs WAV payloads, got {mt}")
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    sampwidth = w.getsampwidth()
                    raw = w.readframes(w.getnframes())
                if sampwidth == 1:
                    quant = [abs(b - 128) for b in raw]
                    scale = 128.0
                elif sampwidth == 2:
                    vals = struct.unpack(f"<{len(raw) // 2}h", raw)
                    quant = [abs(v) for v in vals]
                    scale = 32768.0
                else:
                    raise ValueError(f"unsupported PCM sample width {sampwidth}")
                for f in range(0, len(quant), frame_size):
                    kframe = quant[f : f + frame_size]
                    frame = [k / scale for k in kframe]
                    ids.append(int(doc_id))
                    fidx.append(f // frame_size)
                    ns.append(len(frame))
                    # math.sqrt, not **0.5: pow(x, 0.5) is not IEEE
                    # correctly rounded and drifts 1 ulp from SQL sqrt
                    rms.append(math.sqrt(sum(a * a for a in frame) / len(frame)))
                    eq.append(sum(k * k for k in kframe))
            cols = {
                id_col: pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(fidx, dtype="int32"),
                "n_samples": pd.Series(ns, dtype="int32"),
                "rms": pd.Series(rms, dtype="float64"),
            }
            if with_quantized_energy:
                cols["energy_q"] = pd.Series(eq, dtype="int64")
            yield pd.DataFrame(cols)

    schema = f"{id_col} bigint, frame_idx int, n_samples int, rms double"
    if with_quantized_energy:
        schema += ", energy_q bigint"
    return media.mapInPandas(batches, schema=schema)
