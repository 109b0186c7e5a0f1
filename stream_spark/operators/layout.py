"""Data-layout operators: z-order clustering for multi-column data
skipping.

Parquet scans prune row groups by min/max statistics. A single-column
sort gives perfect skipping on that column and none on any other; a
Morton (z-order) key interleaves the bits of several columns so rows
close in the key are close in EVERY interleaved dimension — each row
group then covers a narrow min/max range on all of them, and filters
on any dimension skip most of the file. This is Delta OPTIMIZE
ZORDER BY, expressed as plain Catalyst bit arithmetic + a range
repartition; no table format required.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` of each column
    (callers normalize to a non-negative int range first — e.g.
    ``F.hash``-free rank buckets or modulo; stay under 63 total bits).

    Pure bit arithmetic (shifts by literals, so JVM-side codegen, no
    UDF) and engine-portable: the same expression spells in ANSI SQL
    with ``>>``/``<<``/``&``.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit key")
    parts = []
    for j, c in enumerate(cols):
        v = c.cast("long")
        for i in range(bits):
            # bit i of column j lands at interleaved position i*n + j
            parts.append(F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 8,
    mod: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the z-order of ``cols``.

    Columns are first folded into the key domain (``% 2^bits`` by
    default, or ``% mod``); the range repartition on the key gives
    each output file a contiguous z-range — the row-group min/max
    narrowing that makes multi-dimensional skipping work. The range
    boundaries come from Spark's own sampled range partitioner —
    no driver-side data movement.
    """
    domain = mod if mod is not None else (1 << bits)
    key = zorder_key([F.col(c).cast("long") % domain for c in cols], bits)
    out = df.withColumn("_zkey", key)
    (
        out.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
