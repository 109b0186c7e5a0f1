"""Bloom-filter join pruning — drop probe rows that cannot match the
build side before paying the real join's shuffle.

At 100 TB the classic shape: the build side (a filtered dimension, a
deduped key list) produces a FIXED-SIZE summary — at most ``m``
distinct bit positions regardless of corpus size — which broadcasts
for pennies, and the probe side is pruned map-only. False positives
pass through (and are eliminated by the real join that follows);
false negatives are impossible.

Determinism: bit positions are md5-derived 16-bit slices
(cross-engine portable, same recipe as text.md5_long), so an ANSI-SQL
oracle computes the identical filter — including its false positives.
Reference has no bloom stage; this is a scale-path addition in the
spirit of pipeline/stage.go's filter stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1 << 16  # bit-space; positions table is bounded by this
N_HASHES = 3


def _positions(key: Column) -> list[Column]:
    """k=3 independent 16-bit positions from one md5: hex slices
    [1,4], [5,4], [9,4] of md5(key) — DuckDB:
    CAST(('0x'||substr(md5(x), off, 4)) AS INT)."""
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 4 * i, 4), 16, 10).cast("int")
        for i in range(N_HASHES)
    ]


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Distinct bit positions set by the build side's keys: a one-column
    ``pos`` DataFrame with ≤ min(3·|build|, 65536) rows — bounded by
    the bit-space, NOT the corpus, hence always broadcast-safe."""
    pos = F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    return df.select(pos).distinct()


def bloom_prune(probe: DataFrame, key_col: str, bits: DataFrame) -> DataFrame:
    """Keep probe rows whose 3 positions are ALL set: three broadcast
    left-semi joins against the bounded positions table. Map-only on
    the probe side — no probe shuffle, no state."""
    out = probe
    for i, p in enumerate(_positions(F.col(key_col))):
        col = f"_bloom_p{i}"
        out = out.withColumn(col, p).join(
            # broadcast-ok: bits is bounded by the 65536-slot bit-space
            F.broadcast(bits.withColumnRenamed("pos", col)),
            col,
            "left_semi",
        )
    return out.drop(*[f"_bloom_p{i}" for i in range(N_HASHES)])
