from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_spark.operators.similarity import (
    cosine,
    cosine_pairs,
    hyperplane_weights,
    topk_bruteforce,
    topk_lsh,
)


@pytest.fixture()
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_known_values(vecs):
    df = vecs.filter(F.col("vec_id").isin(0, 2))
    pairs = cosine_pairs(df, threshold=-1.0)
    got = pairs.collect()[0]
    assert abs(got["cosine"]) < 1e-9  # orthogonal


def test_topk_bruteforce_ordering(vecs):
    q = vecs.filter(F.col("vec_id") == 0)
    c = vecs.filter(F.col("vec_id") > 0)
    out = topk_bruteforce(q, c, k=3).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 1), (2, 2), (3, 3)]  # cos: ~0.994, 0, -1


def test_hyperplanes_deterministic():
    assert hyperplane_weights(2, 4) == hyperplane_weights(2, 4)
    assert all(-1.0 <= w <= 1.0 for row in hyperplane_weights(4, 64) for w in row)


def test_topk_lsh_returns_bucket_neighbors(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 3)
    c = df.filter(F.col("vec_id") >= 3)
    out = topk_lsh(q, c, k=5)
    rows = out.collect()
    assert len(rows) <= 15
    for r in rows:
        assert -1.0 <= r["cosine"] <= 1.0


def test_topk_pandas_matches_exact_neighbor_sets(spark):
    import random

    from stream_spark.operators.ann_pandas import topk_pandas
    from pyspark.sql import functions as F

    rnd = random.Random(11)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(32)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 4)
    c = df.filter(F.col("vec_id") >= 4)
    exact = topk_bruteforce(q, c, k=5)
    fast = topk_pandas(q, c, k=5)
    es = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    fs = {(r["query_id"], r["neighbor_id"]) for r in fast.collect()}
    assert es == fs
