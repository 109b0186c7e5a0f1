"""Streaming deduplication.

Exact streaming dedup = ``dropDuplicates`` on a content key with a
watermark bounding state (Structured Streaming keeps one state entry
per key within the watermark horizon). The content key is the md5 of
normalized text — 16 bytes of state per doc, not the document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.text import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First occurrence of each distinct normalized text passes through.

    With ``ts_col`` the state is watermark-bounded (keys expire once
    older than the horizon — at 100 TB/day unbounded state is not an
    option); without it state grows unboundedly (testing only).
    """
    keyed = stream.withColumn("_content_key", F.md5(normalize_text(F.col(text_col))))
    if ts_col is not None:
        keyed = keyed.withWatermark(ts_col, watermark)
        return keyed.dropDuplicatesWithinWatermark(["_content_key"]).drop("_content_key")
    return keyed.dropDuplicates(["_content_key"]).drop("_content_key")
