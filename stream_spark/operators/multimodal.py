"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python-in-the-row-path surface in
this engine — per-batch numpy/pandas, never per-row Python).

Codecs: PPM (P6) images and PCM16 WAV audio are decoded NATIVELY here
(dependency-free header parse + numpy pixel/sample handling), so the
decode → feature-extract → resize/resample pipeline is real and
oracle-gated end-to-end. Compressed formats (JPEG/PNG/FLAC/...) gate on
the optional libs (PIL absent in this container) and raise
NotImplementedError with the install hint — the mapInPandas slot they
plug into is the same one the native codecs already exercise.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # optional, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# --------------------------------------------------------------------------
# dependency-free codecs (PPM P6 / PCM16 WAV) — pure stdlib + numpy


def encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """P6 binary PPM from a (height, width, 3) uint8 array."""
    if pixels.shape != (height, width, 3):
        raise ValueError(f"pixels must be ({height}, {width}, 3), got {pixels.shape}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary PPM (P6): returns (width, height, HxWx3 uint8).

    Tolerant of the full spec's header freedom — any whitespace between
    tokens and ``#`` comments — not just the bytes ``encode_ppm`` emits.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return width, height, raster.reshape(height, width, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (vectorized index map, no loops)."""
    h, w, _ = pixels.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys[:, None], xs[None, :]]


def encode_wav_pcm16(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono PCM16 WAV (RIFF) from an int16 sample array."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF WAV: returns (sample_rate, int16 mono samples).

    Walks the chunk list (fmt/data may be preceded by LIST/fact/...),
    so files from other writers parse too; only uncompressed mono PCM16
    is supported — anything else raises with the found format.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:
                raise ValueError(f"only PCM (fmt 1) supported, got fmt {fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"only mono PCM16 supported, got {channels}ch {bits}-bit")
    return rate, np.frombuffer(data, dtype="<i2")


def resample_linear(samples: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    """Linear-interpolation resample (np.interp over the time grid)."""
    if in_rate == out_rate or len(samples) == 0:
        return samples.astype(np.float64)
    n_out = max(1, int(round(len(samples) * out_rate / in_rate)))
    t_out = np.arange(n_out) * (in_rate / out_rate)
    return np.interp(t_out, np.arange(len(samples)), samples.astype(np.float64))

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


def synthetic_image_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic P6 corpus derived from the id alone — width
    4+id%5, height 3+id%4, raster byte i = (id+i)%256 — so a SQL
    oracle can recompute every decode output arithmetically without
    parsing binary. The encode runs distributed in the same Arrow
    mapInPandas slot a real ingest (fetch/extract) would occupy."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            payloads: list[bytes] = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                px = ((did + np.arange(w * h * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
                ids.append(did)
                payloads.append(encode_ppm(w, h, px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(batches, "doc_id long, payload binary")


def synthetic_audio_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic mono PCM16 WAV corpus: rate 8000·(1+id%2), length
    40+id%17 samples, sample i = (id·31 + i·7) % 65536 − 32768."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            payloads: list[bytes] = []
            for did in pdf[id_col]:
                did = int(did)
                rate, n = 8000 * (1 + did % 2), 40 + did % 17
                samples = ((did * 31 + np.arange(n) * 7) % 65536 - 32768).astype(np.int16)
                ids.append(did)
                payloads.append(encode_wav_pcm16(rate, samples))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(batches, "doc_id long, payload binary")


#: bits in the profiled generators' perceptual patterns (7×7 image
#: cells / 49 audio windows — the largest square under ahash's 63-bit
#: packing limit)
PROFILE_BITS = 49


def _md5_pattern(salt: str, src_id: int) -> int:
    """The md5-derived 60-bit long (text.md5_long semantics) of
    ``salt || src_id``, truncated to PROFILE_BITS — the perceptual
    pattern the profiled generators bake into their payloads."""
    import hashlib

    return int(hashlib.md5(f"{salt}{src_id}".encode()).hexdigest()[:15], 16) % (
        1 << PROFILE_BITS
    )


def _profiled_image_payload(did: int) -> bytes:
    """One profiled P6 payload (see ``synthetic_profiled_image_table``)
    — extracted so the generator, the column-preserving streaming
    attach, and the binary-corpus stager share ONE encode path."""
    p = _md5_pattern("i", did + 3 if did % 10 == 0 else did)
    cells = ((p >> np.arange(49)) & 1).reshape(7, 7)
    px = np.where(cells == 1, 200, 50).astype(np.uint8)
    px = np.repeat(np.repeat(px, 2, axis=0), 2, axis=1)  # 14×14
    px = np.repeat(px[:, :, None], 3, axis=2)
    return encode_ppm(14, 14, px)


def synthetic_profiled_image_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """14×14 P6 corpus whose 7×7 brightness-cell grid carries 49 bits
    of md5-derived entropy: cell c (row-major over 2×2-pixel blocks) is
    bright (200) iff bit c of ``md5_long('i' || src) % 2^49``, else dim
    (50) — where ``src = id+3`` when ``id % 10 == 0`` (a planted ~10%
    rate of perceptual duplicate PAIRS), else ``id``.

    The closed form the oracle replays: nearest-neighbor 7×7 sampling
    hits pixel (2y, 2x) — inside block (y, x) — so aHash recovers the
    pattern EXACTLY: with k ≥ 1 bright cells the mean gray is
    (150k+2450)/49 ∈ (50, 200], so bright cells pass the ≥-mean test
    and dim cells fail; with k = 0 every cell equals the mean and all
    49 bits set. hash = pattern, or 2^49−1 when pattern == 0.
    (Unlike ``synthetic_image_table``'s smooth gradients — whose aHash
    collapses to a handful of values — this gives near-uniform 49-bit
    perceptual diversity plus exact planted dups, so a hash-group
    dedup stage does real, measurable work.)"""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(d) for d in pdf[id_col]]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_profiled_image_payload(d) for d in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(batches, "doc_id long, payload binary")


def _profiled_audio_payload(did: int) -> bytes:
    """One profiled WAV payload (see ``synthetic_profiled_audio_table``)
    — the shared encode path, same extraction rationale as the image
    twin."""
    p = _md5_pattern("a", did + 2 if did % 7 == 0 else did)
    amp = np.where(((p >> np.arange(49)) & 1) == 1, 1000, 100)
    return encode_wav_pcm16(8000, np.repeat(amp, 16).astype(np.int16))


def synthetic_profiled_audio_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """784-sample 8 kHz mono PCM16 corpus whose 49-window loudness
    profile carries 49 bits of md5-derived entropy: window w (16
    samples each) has amplitude 1000 iff bit w of
    ``md5_long('a' || src) % 2^49``, else 100 — where ``src = id+2``
    when ``id % 7 == 0`` (planted ~14% perceptual-dup pairs), else
    ``id``. Same mean-threshold closed form as the image twin: the
    audio aHash (n_windows=49) recovers the pattern exactly
    (hash = pattern, or 2^49−1 when pattern == 0)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = [int(d) for d in pdf[id_col]]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_profiled_audio_payload(d) for d in ids]}
            )

    return df.select(F.col(id_col)).mapInPandas(batches, "doc_id long, payload binary")


def to_media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Demo media table: utf-8 payload bytes + metadata struct."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.length(F.col(text_col)).alias("declared_len"),
        ).alias("meta"),
    )


def extract_binary_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "payload_md5": [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("img_width", LongType()),
        StructField("img_height", LongType()),
        StructField("pixel_sum", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def decode_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Decode + nearest-neighbor resize over binary image payloads.

    PPM (P6) decodes natively (``decode_ppm`` — header parse + numpy
    raster); compressed formats fall through to PIL when available and
    raise NotImplementedError with the install hint otherwise. Emits
    (doc_id, original dims, exact pixel byte sum, resized RGB raster) —
    the fan-in shape of a training-data image-normalization stage. One
    Arrow batch in, one out; per-image work is vectorized numpy.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in IMAGE_SCHEMA.fields}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    w, h, px = decode_ppm(b)
                elif HAVE_PIL:
                    raise NotImplementedError("wire PIL decode here when the codec is available")
                else:
                    raise NotImplementedError(
                        "compressed image decode requires pillow; install it on "
                        "the cluster image (PPM/P6 decodes natively)"
                    )
                out["doc_id"].append(did)
                out["img_width"].append(w)
                out["img_height"].append(h)
                out["pixel_sum"].append(int(px.astype(np.int64).sum()))
                out["resized"].append(resize_nearest(px, width, height).tobytes())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_SCHEMA)


def ahash_image(media: DataFrame, hash_size: int = 4) -> DataFrame:
    """Perceptual average-hash over decoded images — image-level
    near-dup fingerprinting (the visual twin of simhash): decode,
    nearest-neighbor downsample to hash_size², integer grayscale
    (r+g+b)//3, bit j = gray_j·n ≥ Σgray (cross-multiplied mean
    comparison — exact integer, no float mean), packed little-endian
    by (y·size+x). Identical-looking images collide; small edits flip
    few bits, so downstream grouping is a hash groupBy (exact) or
    hamming-banded join (near). All integer ops ⇒ the oracle recomputes
    every hash arithmetically on the synthetic corpus."""

    _check_hash_bits(hash_size * hash_size, "hash_size " + str(hash_size))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "img_width": [], "img_height": [], "ahash": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, hv = ahash_image_payload(bytes(payload), hash_size)
                out["doc_id"].append(did)
                out["img_width"].append(w)
                out["img_height"].append(h)
                out["ahash"].append(hv)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "doc_id long, img_width long, img_height long, ahash long"
    )


def _check_hash_bits(n: int, what: str) -> None:
    if n >= 64:
        # 1 << 63 overflows the signed ahash long (and numpy int64
        # shifts wrap silently) — 64+ bits needs a multi-long packing
        raise ValueError(f"{what} needs {n} bits; ahash packs into one signed long (max 63)")


def ahash_image_payload(b: bytes, hash_size: int) -> tuple[int, int, int]:
    """aHash one PPM payload → (width, height, hash) — the pure decode
    → downsample → integer mean-threshold path ``ahash_image`` runs per
    row, extracted so every caller (batch, streaming attach, binary
    ingest) hashes through ONE implementation."""
    if b[:2] != b"P6":
        raise NotImplementedError("compressed image decode requires pillow")
    n = hash_size * hash_size
    w, h, px = decode_ppm(b)
    small = resize_nearest(px, hash_size, hash_size).astype(np.int64)
    gray = small.sum(axis=2) // 3
    total = int(gray.sum())
    bits = (gray.reshape(-1) * n >= total).astype(np.int64)
    weights = 1 << np.arange(n).astype(np.int64)
    return w, h, int((bits * weights).sum())


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_sum", LongType()),
        StructField("out_n_samples", LongType()),
    ]
)


def resample_audio(media: DataFrame, rate: int = 16000) -> DataFrame:
    """Decode PCM16 WAV payloads natively and linear-resample to
    ``rate``. Emits source metadata (rate, count, exact int sample sum)
    plus the resampled length — all exact integers, so the decode is
    oracle-checkable; the interpolated VALUES are float64 and are
    verified against closed-form np.interp expectations in pytest
    instead. Compressed audio would gate on an optional lib exactly
    like ``decode_image``'s PIL branch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                in_rate, samples = decode_wav_pcm16(bytes(payload))
                res = resample_linear(samples, in_rate, rate)
                out["doc_id"].append(did)
                out["sample_rate"].append(in_rate)
                out["n_samples"].append(len(samples))
                out["sample_sum"].append(int(samples.astype(np.int64).sum()))
                out["out_n_samples"].append(len(res))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256, stride: int = 4) -> DataFrame:
    """Video-style frame sampling plumbing: each payload is framed
    into ``frame_size``-byte chunks and every ``stride``-th frame is
    emitted — ONE input row fans out to many output rows inside the
    Arrow batch, the exact shape a real decoder (pyav/ffmpeg) slots
    into. Frames are deterministic byte slices here (codecs are not in
    this container), so md5/length are verifiable end-to-end.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    fr = b[fi * frame_size : (fi + 1) * frame_size]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(fi)
                    out["frame_len"].append(len(fr))
                    out["frame_md5"].append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int64", "frame_len": "int64"}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


#: longest clip whose cross-multiplied window-mean comparison stays
#: inside int64: worst-case e = 32768·n, so e·n ≤ 2^15·n² needs
#: n < 2^24 (~35 min at 8 kHz); one power of two of margin below that.
_ENERGY_CMP_INT64_MAX_N = 1 << 23


def _energy_bits(e, nw, total: int, n: int):
    """Per-window loudness bits: bit w = (mean energy of window w ≥
    global mean), compared cross-multiplied (e_w·n ≥ total·n_w — no
    float mean). Vectorized int64 while the products provably fit
    (n < 2^23 — see _ENERGY_CMP_INT64_MAX_N); for longer clips numpy's
    int64 multiply would WRAP silently (ADVICE r8: full-scale audio
    overflows past ~2^24 samples), so the comparison falls back to
    arbitrary-precision Python ints — n_windows comparisons per clip,
    nanoseconds either way. The energy SUMS themselves (int64 Σ|s| ≤
    2^15·n) are exact to n < 2^48 (~1 year of 8 kHz audio), far past
    any single clip."""
    import numpy as np

    if n < _ENERGY_CMP_INT64_MAX_N:
        return (e * n >= total * nw).astype(np.int64)
    return np.array(
        [1 if int(ei) * n >= total * int(nwi) else 0 for ei, nwi in zip(e, nw)],
        dtype=np.int64,
    )


def ahash_audio(media: DataFrame, n_windows: int = 16) -> DataFrame:
    """Perceptual average-hash over decoded audio — the acoustic twin
    of ``ahash_image``: native PCM16 WAV decode, the sample stream
    split into ``n_windows`` near-equal index windows (window of
    sample i = i·W DIV n), per-window energy = Σ|amplitude| in exact
    int64 (samples widened BEFORE abs — |int16 −32768| overflows in
    int16), bit w set iff the window's MEAN energy ≥ the global mean
    via the same cross-multiplied integer comparison the image path
    uses (e_w·n ≥ total·n_w — no float mean), packed little-endian.
    Loudness-profile-identical clips collide; small edits flip few
    bits, so grouping is a hash groupBy (exact) or hamming-banded
    join (near) — all integer ops, so the oracle recomputes every
    hash arithmetically on the synthetic corpus."""
    _check_hash_bits(n_windows, "n_windows " + str(n_windows))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "sample_rate": [], "n_samples": [], "audio_hash": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n, hv = ahash_audio_payload(bytes(payload), n_windows)
                out["doc_id"].append(did)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["audio_hash"].append(hv)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches, "doc_id long, sample_rate long, n_samples long, audio_hash long"
    )


def attach_profiled_hash(
    df: DataFrame, modality: str, id_col: str = "doc_id", out: str | None = None
) -> DataFrame:
    """Attach the profiled perceptual hash as a NEW COLUMN, keeping
    every input column — the streaming-legal spelling of the
    media_hash stage (the batch stage joins a (id, hash) frame back on
    the id key; a stream cannot self-join without watermark state, so
    here generate → encode → decode → hash runs in ONE Arrow
    mapInPandas pass over the full row batch). Exactly the same
    payload and hash paths as the batch stage (the shared
    ``_profiled_*_payload`` / ``ahash_*_payload`` helpers), so batch
    and streaming agree bit-for-bit."""
    if modality == "image":
        def hash_one(did: int) -> int:
            return ahash_image_payload(_profiled_image_payload(did), 7)[2]
    elif modality == "audio":
        def hash_one(did: int) -> int:
            return ahash_audio_payload(_profiled_audio_payload(did), 49)[2]
    else:
        raise ValueError(f"unsupported attach_profiled_hash modality: {modality!r}")
    out = out or f"{modality}_hash"
    if out in df.columns:
        raise ValueError(
            f"attach_profiled_hash output column {out!r} already exists in the "
            "input; pass a distinct `out` name (a silent duplicate would make "
            "every downstream reference ambiguous)"
        )
    schema = StructType(df.schema.fields + [StructField(out, LongType())])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf[out] = [hash_one(int(d)) for d in pdf[id_col]]
            yield pdf

    return df.mapInPandas(batches, schema)


def ahash_audio_payload(b: bytes, n_windows: int) -> tuple[int, int, int]:
    """aHash one WAV payload → (sample_rate, n_samples, hash) — the
    pure per-clip path ``ahash_audio`` runs per row (same extraction
    rationale as ``ahash_image_payload``)."""
    rate, samples = decode_wav_pcm16(b)
    a = np.abs(samples.astype(np.int64))
    n = len(a)
    wi = (np.arange(n) * n_windows) // n
    # np.bincount(weights=) accumulates in float64 — keep the
    # energy sums exact int64 via indexed integer accumulation
    e = np.zeros(n_windows, dtype=np.int64)
    np.add.at(e, wi, a)
    nw = np.bincount(wi, minlength=n_windows).astype(np.int64)
    total = int(a.sum())
    bits = _energy_bits(e, nw, total, n)
    weights = 1 << np.arange(n_windows).astype(np.int64)
    return rate, n, int((bits * weights).sum())
