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
