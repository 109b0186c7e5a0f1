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


def test_decode_image_stub_raises_without_codec(media):
    if HAVE_PIL:
        pytest.skip("pillow present; stub not applicable")
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(media)


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
