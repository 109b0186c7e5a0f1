from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.functions.aggregates import agg_expr


def test_all_functions(spark):
    df = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 6.0)], "o int, v double")
    row = df.agg(
        agg_expr("sum", F.col("v"), alias="s"),
        agg_expr("avg", F.col("v"), alias="a"),
        agg_expr("min", F.col("v"), alias="mn"),
        agg_expr("max", F.col("v"), alias="mx"),
        agg_expr("count", F.col("v"), alias="c"),
        agg_expr("accumulate", F.col("v"), F.col("o"), alias="acc"),
    ).collect()[0]
    assert row["s"] == 12.0 and row["a"] == 4.0
    assert row["mn"] == 2.0 and row["mx"] == 6.0
    assert row["c"] == 3
    assert row["acc"] == [2.0, 4.0, 6.0]


def test_exact_decimal_sum_avg(spark):
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], "v double")
    row = df.agg(
        agg_expr("sum", F.col("v"), alias="s", exact_decimal=True),
        agg_expr("avg", F.col("v"), alias="a", exact_decimal=True),
    ).collect()[0]
    assert row["s"] == 0.6  # decimal accumulation, not 0.6000000000000001
    assert row["a"] == 0.6 / 3  # deterministic double division of exact sum


def test_unknown_function_raises():
    with pytest.raises(ValueError, match="unsupported function"):
        agg_expr("median", F.col("v"))
