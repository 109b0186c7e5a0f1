"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` on the same key.

Spark has no native as-of join. The scalable realization is the
union-and-carry trick: tag both sides, union, sort within key by
(ts, side-priority), and carry the last seen right-side values forward
with ``last(..., ignorenulls)`` over an unbounded-preceding frame.
One shuffle on the key, no range fan-out, no per-row search — the
plan scales like any keyed window, unlike a range-join which explodes
or a broadcast loop which doesn't distribute.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """Left as-of join; right-side columns arrive suffixed. Rows with no
    earlier right row keep NULLs (left-outer semantics).

    ``tolerance_ms`` (pandas merge_asof parity): a carried match older
    than the bound is nulled out after the carry — same one-shuffle
    plan, just a map-side mask on top. Timestamp columns are compared
    in epoch-ms; plain numeric ts columns are compared directly (the
    bound is then in the column's own units)."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    is_ts = dict(right.dtypes)[right_ts].startswith("timestamp")
    if tolerance_ms is not None:
        rts = F.col("_ats").cast("timestamp") if is_ts else F.col("_ats")
        r = r.withColumn(f"_tolrts{suffix}", F.unix_millis(rts) if is_ts else rts)

    carry_names = [f"{c}{suffix}" for c in right_cols] + (
        [f"_tolrts{suffix}"] if tolerance_ms is not None else []
    )

    merged = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts → a right
    # row AT the left timestamp is visible, matching ts <= left.ts.
    # The suffixed right columns break ties among right rows sharing
    # (key, ts): last() then deterministically carries the greatest
    # right tuple regardless of partitioning (they are NULL on left
    # rows, whose relative order never affects the carry).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ats"), F.col("_side"), *[F.col(f"{c}{suffix}") for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "*",
        *[F.last(n, ignorenulls=True).over(w).alias(f"_carry_{n}") for n in carry_names],
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        lts = F.col("_ats")
        is_ts_l = dict(left.dtypes)[left_ts].startswith("timestamp")
        left_ms = F.unix_millis(lts.cast("timestamp")) if is_ts_l else lts
        in_tol = (left_ms - F.col(f"_carry__tolrts{suffix}")) <= F.lit(tolerance_ms)
        picked = [
            F.when(in_tol, F.col(f"_carry_{c}{suffix}")).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    else:
        picked = [F.col(f"_carry_{c}{suffix}").alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*lcols, *picked)


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """The same as-of semantics through ``cogroup().applyInPandas`` —
    both sides shuffle once on the key, each key's rows meet in ONE
    Arrow batch, and ``pd.merge_asof`` (a backward binary search, not
    a window carry) resolves the matches.

    Exists as the second, independently-derived implementation of
    ``asof_join`` (tests/test_operators_misc.py checks they agree row
    for row) and as the template for per-key pandas logic that Catalyst
    can't express — the cogroup surface is the right tool whenever two
    streams must be aligned with arbitrary per-key Python. Slower than
    the Catalyst carry (Python in the row path): prefer ``asof_join``
    unless the per-key logic demands pandas.

    Caveat vs the carry implementation: a cogroup pair must fit in
    executor memory per key — hot keys that a window absorbs can OOM a
    pandas batch, so keep it off corpus-hot keys.
    """
    import pandas as pd

    lcols = list(left.columns)
    out_cols = lcols + [f"{c}{suffix}" for c in right_cols]
    l_is_ts = dict(left.dtypes)[left_ts].startswith("timestamp")

    schema_parts = []
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    for c in lcols:
        schema_parts.append(f"{c} {ltypes[c]}")
    for c in right_cols:
        schema_parts.append(f"{c}{suffix} {rtypes[c]}")
    schema = ", ".join(schema_parts)

    # pre-suffix the right side: shared column names across the two
    # cogroup sides resolve ambiguously (the right-side batch can
    # arrive pruned to just the key), and the pandas fn wants the
    # output names anyway
    suffixed = [f"{c}{suffix}" for c in right_cols]
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        if lg.empty:
            return pd.DataFrame(columns=out_cols)
        lg = lg.sort_values(left_ts, kind="mergesort")
        if rg.empty:
            out = lg.copy()
            for c in suffixed:
                out[c] = None
            return out[out_cols]
        rg = rg[["_rts"] + suffixed]
        # greatest right tuple wins ties on (key, ts) — parity with the
        # carry implementation's deterministic tie-break
        rg = rg.sort_values(["_rts"] + suffixed, kind="mergesort")
        tol = pd.Timedelta(milliseconds=tolerance_ms) if (tolerance_ms is not None and l_is_ts) else (
            tolerance_ms if tolerance_ms is not None else None
        )
        out = pd.merge_asof(
            lg, rg, left_on=left_ts, right_on="_rts",
            direction="backward", tolerance=tol,
        )
        return out[out_cols]

    return (
        left.groupBy(key)
        .cogroup(r2.groupBy(key))
        .applyInPandas(lambda lg, rg: merge(lg, rg), schema=schema)
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """NEAREST-direction as-of (pandas merge_asof direction='nearest'
    parity, ties → backward): for each left row, the right timestamp
    minimizing |Δt| on the same key. ``left_ts``/``right_ts`` are
    NUMERIC (e.g. epoch-ms) columns — cast timestamps before calling.

    Returns the left columns plus ``near_ts`` (NULL when the key has
    no right rows), ``delta`` (|Δt|, same units), and ``direction``
    ('backward' / 'forward' / NULL).

    Same scale shape as ``asof_join``: ONE union + one keyed sort; the
    backward candidate is a last(ignorenulls) over the preceding frame
    and the forward candidate a first(ignorenulls) over the following
    frame — two frames of the SAME window sort, one WindowExec, one
    shuffle. A right row at exactly the left timestamp is seen by the
    backward frame (side ordering) and wins with Δt=0, which is also
    what the nearest rule picks — so the equal-ts asymmetry between
    the frames is unobservable in the result."""
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = (
        right.select(F.col(key), F.col(right_ts).alias("_ats"))
        .withColumn("_side", F.lit(0))
        .withColumn("_rts", F.col("_ats"))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    wb = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    c = merged.select(
        "*",
        F.last("_rts", ignorenulls=True).over(wb).alias("_b"),
        F.first("_rts", ignorenulls=True).over(wf).alias("_f"),
    ).filter(F.col("_side") == 1)
    db = F.col("_ats") - F.col("_b")
    df_ = F.col("_f") - F.col("_ats")
    nearer_b = F.col("_f").isNull() | (F.col("_b").isNotNull() & (db <= df_))
    return c.select(
        *lcols,
        F.when(nearer_b, F.col("_b")).otherwise(F.col("_f")).alias("near_ts"),
        F.when(nearer_b, db).otherwise(df_).alias("delta"),
        F.when(F.col("_b").isNull() & F.col("_f").isNull(), F.lit(None).cast("string"))
        .when(nearer_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )
