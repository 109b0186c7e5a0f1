from __future__ import annotations

import pytest

from stream_spark.operators.filters import apply_filter


def test_non_zero_scalar(spark):
    df = spark.createDataFrame([(0,), (1,), (-2,), (0,)], "v int")
    assert apply_filter(df, "non-zero", "v").count() == 2


def test_non_zero_array(spark):
    df = spark.createDataFrame([([0, 0],), ([0, 3],), ([],)], "v array<int>")
    got = [r["v"] for r in apply_filter(df, "non-zero", "v").collect()]
    assert got == [[0, 3]]  # all-zero and empty arrays filtered out


def test_threshold_and_range(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    assert apply_filter(df, "threshold", "v", value=7, op=">=").count() == 3
    assert apply_filter(df, "range", "v", low=2, high=4).count() == 3


def test_regex(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "s string")
    assert apply_filter(df, "regex", "s", pattern="^a").count() == 1


def test_unknown_filter_raises(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="unsupported filter"):
        apply_filter(df, "bogus", "v")
