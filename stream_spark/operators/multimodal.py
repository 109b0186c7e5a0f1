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
