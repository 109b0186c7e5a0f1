"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` (the only sanctioned Python-in-the-row-path surface in
this engine — per-batch numpy/pandas, never per-row Python).

The actual media codecs are NOT available in this environment, so
``decode_image``/``resample_audio`` are stubs: they raise
NotImplementedError unless the optional libs import, while
``extract_binary_features`` computes real, deterministic features
(byte length, md5) so the Spark plumbing — schema, batching, partition
behavior — is fully exercised and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

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

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("payload_md5", StringType()),
    ]
)


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


def decode_image(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Decode+resize stub: real pipeline shape, codec gated on PIL."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires pillow; install it on the cluster image. "
            "The mapInPandas plumbing is exercised via extract_binary_features."
        )
    raise NotImplementedError("wire PIL decode here when the codec is available")


def resample_audio(media: DataFrame, rate: int = 16000) -> DataFrame:
    raise NotImplementedError("audio codecs unavailable in this environment")
