from __future__ import annotations

import hashlib

import pytest

from stream_spark.operators.multimodal import (
    HAVE_PIL,
    decode_image,
    extract_binary_features,
    to_media_table,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "spark engine")], "doc_id long, text string")
    return to_media_table(df)


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_feature_extraction_roundtrip(media):
    out = {r["doc_id"]: r for r in extract_binary_features(media).collect()}
    assert out[1]["byte_len"] == len(b"hello world")
    assert out[1]["payload_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert out[2]["media_type"] == "text/plain"


def test_decode_image_compressed_gate_raises_without_codec(media):
    if HAVE_PIL:
        pytest.skip("pillow present; gate not applicable")
    # non-PPM payloads hit the optional-lib gate at execution time
    with pytest.raises(Exception, match="pillow"):
        decode_image(media).collect()


def test_sample_frames_fanout_and_boundaries(spark):
    """Fan-out shape and edges: payload shorter than one frame, exact
    multiple of frame size, and a partial tail frame."""
    import hashlib

    from stream_spark.operators.multimodal import sample_frames, to_media_table

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 512), (3, "c" * 700)], ["doc_id", "text"]
    )
    out = sample_frames(to_media_table(docs), frame_size=256, stride=2)
    rows = {(r["doc_id"], r["frame_idx"]): (r["frame_len"], r["frame_md5"]) for r in out.collect()}
    # doc 1: one short frame; doc 2: frames 0,1 → sampled 0; doc 3: frames 0,1,2 → sampled 0,2
    assert set(rows) == {(1, 0), (2, 0), (3, 0), (3, 2)}
    assert rows[(1, 0)][0] == 100
    assert rows[(3, 2)] == (700 - 512, hashlib.md5(b"c" * (700 - 512)).hexdigest())


# --------------------------------------------------------------------------
# native codecs (PPM P6 / PCM16 WAV)


def test_ppm_roundtrip_and_tolerant_header():
    import numpy as np

    from stream_spark.operators.multimodal import decode_ppm, encode_ppm

    px = (np.arange(5 * 3 * 3) % 256).astype(np.uint8).reshape(3, 5, 3)
    w, h, got = decode_ppm(encode_ppm(5, 3, px))
    assert (w, h) == (5, 3) and (got == px).all()
    # spec freedom: comments + arbitrary whitespace between tokens
    loose = b"P6 # a comment\n  5\t3 # dims\n 255\n" + px.tobytes()
    w, h, got = decode_ppm(loose)
    assert (w, h) == (5, 3) and (got == px).all()
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")


def test_resize_nearest_matches_manual():
    import numpy as np

    from stream_spark.operators.multimodal import resize_nearest

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(px, 3, 2)
    manual = np.array([[px[(y * 4) // 2, (x * 6) // 3] for x in range(3)] for y in range(2)])
    assert out.shape == (2, 3, 3) and (out == manual).all()


def test_wav_roundtrip_chunk_walk_and_gates():
    import struct

    import numpy as np

    from stream_spark.operators.multimodal import decode_wav_pcm16, encode_wav_pcm16

    samples = ((np.arange(50) * 7919) % 65536 - 32768).astype(np.int16)
    rate, got = decode_wav_pcm16(encode_wav_pcm16(8000, samples))
    assert rate == 8000 and (got == samples).all()
    # an extra odd-sized chunk before fmt/data must be walked over
    payload = encode_wav_pcm16(8000, samples)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # word-aligned pad
    spliced = payload[:12] + extra + payload[12:]
    rate, got = decode_wav_pcm16(spliced)
    assert rate == 8000 and (got == samples).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"nope")


def test_resample_linear_matches_closed_form():
    import numpy as np

    from stream_spark.operators.multimodal import resample_linear

    samples = np.array([0, 100, -100, 50], dtype=np.int16)
    # 8k -> 16k: outputs at t = 0, .5, 1, 1.5, ... are midpoints
    out = resample_linear(samples, 8000, 16000)
    assert len(out) == 8
    assert out[0] == 0.0 and out[1] == 50.0 and out[2] == 100.0 and out[3] == 0.0
    # identity when rates match
    same = resample_linear(samples, 16000, 16000)
    assert (same == samples).all()


def test_decode_image_distributed(spark):
    import numpy as np

    from stream_spark.operators.multimodal import decode_image, synthetic_image_table

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    out = {r["doc_id"]: r for r in decode_image(synthetic_image_table(docs), 4, 4).collect()}
    for did in range(7):
        w, h = 4 + did % 5, 3 + did % 4
        r = out[did]
        assert (r["img_width"], r["img_height"]) == (w, h)
        assert r["pixel_sum"] == int(((did + np.arange(w * h * 3)) % 256).sum())
        assert len(r["resized"]) == 4 * 4 * 3


def test_resample_audio_distributed(spark):
    from stream_spark.operators.multimodal import resample_audio, synthetic_audio_table

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    out = {r["doc_id"]: r for r in resample_audio(synthetic_audio_table(docs), 16000).collect()}
    for did in range(5):
        n = 40 + did % 17
        assert out[did]["n_samples"] == n
        assert out[did]["sample_rate"] == 8000 * (1 + did % 2)
        assert out[did]["out_n_samples"] == (n if did % 2 else 2 * n)


def test_ahash_brightness_invariant_and_dup_collision(spark):
    """aHash is mean-relative: a uniformly brightness-shifted copy
    hashes IDENTICALLY (gray+c)·16 ≥ total+16c ⟺ gray·16 ≥ total —
    the perceptual property that catches re-encoded/brightened dups
    exact byte hashing misses. Identical rasters collide trivially;
    an inverted raster must not."""
    import numpy as np

    from stream_spark.operators.multimodal import ahash_image, encode_ppm

    base = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    bright = np.clip(base.astype(np.int64) + 50, 0, 255).astype(np.uint8)
    assert (base <= 205).all()  # no clipping -> exact +50 shift
    inverted = (255 - base).astype(np.uint8)
    rows = [
        (1, encode_ppm(8, 6, base)),
        (2, encode_ppm(8, 6, base)),      # byte-identical dup
        (3, encode_ppm(8, 6, bright)),    # brightness-shifted dup
        (4, encode_ppm(8, 6, inverted)),  # perceptual opposite
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["ahash"] for r in ahash_image(media).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]


def test_ahash_rejects_overflowing_hash_size(spark):
    """hash_size ≥ 8 needs ≥64 weight bits — 1<<63 wraps negative in
    int64 and silently corrupts hashes, so the operator must refuse."""
    import pytest

    from stream_spark.operators.multimodal import ahash_image

    media = spark.createDataFrame([], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="signed long"):
        ahash_image(media, hash_size=8)
    # 7x7 = 49 bits still packs fine
    assert ahash_image(media, hash_size=7).count() == 0


def test_streaming_ahash_dedup_custom_columns(spark, tmp_path):
    """streaming_ahash_dedup's id_col/payload_col parameters must reach
    the Arrow batch (regression: ahash_image hardcodes doc_id/payload,
    so un-renamed custom columns raised KeyError inside the UDF)."""
    import numpy as np

    from stream_spark.operators.multimodal import encode_ppm
    from stream_spark.streaming import file_replay_stream, run_stream_to_memory
    from stream_spark.streaming.dedup import streaming_ahash_dedup

    base = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rows = [(10, encode_ppm(4, 4, base)), (11, encode_ppm(4, 4, base))]
    df = spark.createDataFrame(rows, "image_id long, blob binary")
    stream = file_replay_stream(
        spark, df.repartition(1), str(tmp_path / "ahash_cols"), n_slices=1,
        max_files_per_trigger=None,
    )
    out = run_stream_to_memory(
        streaming_ahash_dedup(stream, payload_col="blob", id_col="image_id"),
        output_mode="append",
    )
    got = {r["doc"]: r["hit"] for r in out.collect()}
    assert got == {10: 0, 11: 1}


def test_ahash_audio_loudness_profile_properties(spark):
    """Pins the r8 audio fingerprint semantics: (1) amplitude SCALING
    preserves the hash (the cross-multiplied mean comparison is scale
    free — the acoustic analog of the image brightness pin), (2)
    moving the loud region to a different window changes the hash, and
    (3) identical clips collide."""
    import numpy as np

    from stream_spark.operators.multimodal import ahash_audio, encode_wav_pcm16

    n = 64
    quiet = np.full(n, 10, dtype=np.int16)
    loud_head = quiet.copy(); loud_head[:8] = 1000
    loud_tail = quiet.copy(); loud_tail[-8:] = 1000
    rows = [
        (1, encode_wav_pcm16(8000, loud_head)),
        (2, encode_wav_pcm16(8000, (loud_head.astype(np.int32) * 2).astype(np.int16))),
        (3, encode_wav_pcm16(8000, loud_tail)),
        (4, encode_wav_pcm16(8000, loud_head)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["audio_hash"] for r in ahash_audio(df).collect()}
    assert got[1] == got[2]          # scale invariant
    assert got[1] == got[4]          # identical clips collide
    assert got[1] != got[3]          # profile shift flips bits


def test_profiled_media_hash_closed_form_and_planted_dups(spark):
    """The multimodal-capstone oracle's theorem, pinned bit-for-bit:
    the REAL decode→aHash path over the profiled synthetic corpora
    recovers the md5-derived 49-bit pattern exactly (hash = pattern,
    2^49−1 when pattern == 0), and the planted pairings collide —
    image id%10==0 ↔ id+3, audio id%7==0 ↔ id+2."""
    from stream_spark.operators.multimodal import (
        PROFILE_BITS,
        _md5_pattern,
        ahash_audio,
        ahash_image,
        synthetic_profiled_audio_table,
        synthetic_profiled_image_table,
    )

    ids = [0, 1, 2, 3, 7, 9, 10, 13, 14, 16, 20, 23, 49, 51, 70, 72, 100, 103]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    img = {
        r["doc_id"]: r["ahash"]
        for r in ahash_image(synthetic_profiled_image_table(df), hash_size=7).collect()
    }
    aud = {
        r["doc_id"]: r["audio_hash"]
        for r in ahash_audio(synthetic_profiled_audio_table(df), n_windows=49).collect()
    }
    top = (1 << PROFILE_BITS) - 1
    for i in ids:
        pi = _md5_pattern("i", i + 3 if i % 10 == 0 else i)
        pa = _md5_pattern("a", i + 2 if i % 7 == 0 else i)
        assert img[i] == (pi or top)
        assert aud[i] == (pa or top)
    assert img[10] == img[13] and img[20] == img[23] and img[100] == img[103]
    assert aud[7] == aud[9] and aud[14] == aud[16] and aud[49] == aud[51]
    # non-planted ids are (overwhelmingly) distinct — entropy is real
    assert len({img[i] for i in ids if i % 10}) == len([i for i in ids if i % 10])


def test_energy_bits_exact_past_int64_overflow():
    """The window-mean comparison e·n ≥ total·n_w wraps int64 once
    32768·n² exceeds 2^63 (n ≳ 2^24 — ADVICE r8); past the guard the
    bits must come from arbitrary-precision arithmetic, not wrapped
    products. Constructed clip: n = 2^25 full-scale samples where the
    vectorized int64 products provably wrap (asserted), yet the two
    uniform windows must BOTH set their bit (mean == global mean)."""
    import numpy as np

    from stream_spark.operators.multimodal import (
        _ENERGY_CMP_INT64_MAX_N,
        _energy_bits,
    )

    n = 1 << 25
    assert n > _ENERGY_CMP_INT64_MAX_N
    half = n // 2
    e = np.array([32768 * half, 32768 * half], dtype=np.int64)  # two equal windows
    nw = np.array([half, half], dtype=np.int64)
    total = 32768 * n
    # the int64 fast path WOULD wrap here: e*n overflows 2^63
    with np.errstate(over="ignore"):
        wrapped = e.astype(np.int64) * np.int64(n)
    assert (wrapped < 0).any() or (wrapped != 32768 * half * n).any()
    assert _energy_bits(e, nw, total, n).tolist() == [1, 1]
    # and a window strictly below the mean stays 0 at the same scale
    e2 = np.array([32768 * half - 1, 32768 * half + 1], dtype=np.int64)
    assert _energy_bits(e2, nw, total, n).tolist() == [0, 1]
    # fast-path small clip agrees with the exact spelling bit-for-bit
    e3 = np.array([10, 30], dtype=np.int64)
    nw3 = np.array([2, 2], dtype=np.int64)
    assert _energy_bits(e3, nw3, 40, 4).tolist() == [0, 1]


def test_incremental_verified_is_subset_of_signature_flags(spark, sf_dir):
    """The r8 verified incremental path can only DEMOTE signature-level
    dup flags, never invent one: every is_dup=1 doc also band-collides
    (C35 flag set), every verified dup carries a best match with
    jaccard >= the threshold, and non-dups carry NULLs."""
    from stream_spark.queries.dedup_queries import (
        dedup_incremental_batch,
        dedup_incremental_verified,
    )

    flags = {r["doc_id"]: r["is_dup"] for r in dedup_incremental_batch(spark, sf_dir).collect()}
    ver = dedup_incremental_verified(spark, sf_dir).collect()
    assert {r["doc_id"] for r in ver} == set(flags)
    assert any(r["is_dup"] == 1 for r in ver)  # testdata plants near-dups
    for r in ver:
        if r["is_dup"] == 1:
            assert flags[r["doc_id"]] == 1
            assert r["best_match"] is not None and r["best_jaccard"] >= 0.8
        else:
            assert r["best_match"] is None and r["best_jaccard"] is None


def test_attach_profiled_hash_matches_batch_join_path(spark):
    """The column-preserving streaming attach (one combined Arrow pass)
    must agree BIT-FOR-BIT with the batch media_hash spelling
    (generator table -> ahash -> join back) for both modalities — the
    parity claim the streaming pipeline twin rests on — and must keep
    every input column."""
    from pyspark.sql import functions as F

    from stream_spark.operators.multimodal import (
        ahash_audio,
        ahash_image,
        attach_profiled_hash,
        synthetic_profiled_audio_table,
        synthetic_profiled_image_table,
    )

    df = spark.range(0, 40).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    att = attach_profiled_hash(
        attach_profiled_hash(df, "image"), "audio"
    )
    assert att.columns == ["doc_id", "text", "image_hash", "audio_hash"]
    got = {r["doc_id"]: (r["text"], r["image_hash"], r["audio_hash"]) for r in att.collect()}

    img = {
        r["doc_id"]: r["ahash"]
        for r in ahash_image(synthetic_profiled_image_table(df), hash_size=7).collect()
    }
    aud = {
        r["doc_id"]: r["audio_hash"]
        for r in ahash_audio(synthetic_profiled_audio_table(df), n_windows=49).collect()
    }
    assert len(got) == 40
    for did, (text, ih, ah) in got.items():
        assert text == f"t{did}"
        assert ih == img[did]
        assert ah == aud[did]


def test_attach_profiled_hash_rejects_unknown_modality(spark):
    import pytest as _pytest

    from stream_spark.operators.multimodal import attach_profiled_hash

    df = spark.range(3).selectExpr("id AS doc_id")
    with _pytest.raises(ValueError, match="modality"):
        attach_profiled_hash(df, "video")
