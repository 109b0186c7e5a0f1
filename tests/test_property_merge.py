"""Hypothesis property tests for merge_upsert and zorder_key against
direct Python models — random inputs, exhaustive semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keys = st.integers(min_value=0, max_value=15)
vals = st.integers(min_value=-100, max_value=100)

target_rows = st.lists(
    st.tuples(keys, vals), max_size=20, unique_by=lambda t: t[0]
)
update_rows = st.lists(
    st.tuples(keys, vals, st.booleans(), st.integers(min_value=0, max_value=5)),
    max_size=20,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(target=target_rows, updates=update_rows)
def test_merge_upsert_matches_dict_model(spark, target, updates):
    """MERGE semantics vs a dict fold: apply updates in (order, value,
    del) order — greatest order tuple wins per key; deletes remove."""
    from stream_spark.operators.merge import merge_upsert

    t = spark.createDataFrame(target, "k long, v long") if target else spark.createDataFrame([], "k long, v long")
    u = (
        spark.createDataFrame(updates, "k long, v long, del boolean, ver long")
        if updates
        else spark.createDataFrame([], "k long, v long, del boolean, ver long")
    )
    got = {
        r.k: r.v
        for r in merge_upsert(t, u, ["k"], delete_col="del", order_cols=["ver"]).collect()
    }

    model = dict(target)
    # per key: the update with the greatest (ver, del, v) struct wins —
    # mirror the operator's max-of-struct tie-break exactly
    best: dict = {}
    for k, v, d, ver in updates:
        cand = (ver, d, v)
        if k not in best or cand > best[k]:
            best[k] = cand
    for k, (ver, d, v) in best.items():
        if d:
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.integers(min_value=0, max_value=255),
    b=st.integers(min_value=0, max_value=255),
)
def test_zorder_key_matches_bit_model(spark, a, b):
    from pyspark.sql import functions as F

    from stream_spark.operators.layout import zorder_key

    got = (
        spark.range(1)
        .select(zorder_key([F.lit(a), F.lit(b)], bits=8).alias("z"))
        .collect()[0]["z"]
    )
    expect = 0
    for i in range(8):
        expect |= ((a >> i) & 1) << (2 * i)
        expect |= ((b >> i) & 1) << (2 * i + 1)
    assert got == expect


def test_zorder_key_rejects_overflow(spark):
    import pytest
    from pyspark.sql import functions as F

    from stream_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="64-bit"):
        zorder_key([F.lit(1)] * 4, bits=16)
