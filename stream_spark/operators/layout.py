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
    # pmod, not %: Spark's % keeps the dividend's sign, so negative
    # values would land outside zorder_key's required [0, domain) range
    key = zorder_key([F.pmod(F.col(c).cast("long"), F.lit(domain)) for c in cols], bits)
    out = df.withColumn("_zkey", key)
    (
        out.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def build_stats_manifest(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Iceberg/Delta-style file-stats manifest over a plain parquet
    directory: one row per data file with row count and per-column
    min/max (numeric cols, surfaced as DOUBLE), harvested from the
    parquet footers by executors via mapInPandas — the driver only
    lists file NAMES (bounded metadata); no data pages are read.

    Query planning reads the manifest (KBs) instead of opening every
    footer at plan time: `manifest_prune` turns a range predicate into
    the list of files that can possibly match — on a z-ordered table
    that's the multi-dimensional skipping the layout bought.
    """
    import glob as _glob

    import pandas as pd

    files = sorted(_glob.glob(f"{path}/*.parquet")) or sorted(
        _glob.glob(f"{path}/**/*.parquet", recursive=True)
    )
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(len(files), 32) or 1
    )
    want = list(cols)

    def harvest(it):
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                row = {"file": f, "n_rows": md.num_rows}
                mins: dict = {}
                maxs: dict = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for i in range(g.num_columns):
                        c = g.column(i)
                        name = c.path_in_schema
                        if name not in want or c.statistics is None:
                            continue
                        s = c.statistics
                        mins[name] = s.min if name not in mins else min(mins[name], s.min)
                        maxs[name] = s.max if name not in maxs else max(maxs[name], s.max)
                for name in want:
                    row[f"min_{name}"] = float(mins[name]) if name in mins else None
                    row[f"max_{name}"] = float(maxs[name]) if name in maxs else None
                rows.append(row)
            yield pd.DataFrame(rows)

    stat_fields = ", ".join(f"min_{c} double, max_{c} double" for c in want)
    return fdf.mapInPandas(harvest, schema=f"file string, n_rows long, {stat_fields}")


def manifest_prune(manifest: DataFrame, col: str, lo: float, hi: float) -> list:
    """Files whose [min, max] range for ``col`` intersects [lo, hi] —
    the candidate set a range scan must read (collect is bounded: one
    row per file). Files with no stats are kept (can't prove absence)."""
    hit = manifest.filter(
        F.col(f"min_{col}").isNull()
        | ~((F.col(f"max_{col}") < lo) | (F.col(f"min_{col}") > hi))
    )
    return [r["file"] for r in hit.select("file").collect()]


def read_parquet_range(
    spark, path: str, col: str, lo: float, hi: float, manifest: DataFrame | None = None
) -> DataFrame:
    """Manifest-planned range scan: prune data files by their min/max
    stats BEFORE Spark opens them, then apply the exact predicate to
    the survivors. With no manifest passed, one is built on the fly
    (footer-only reads, executor-side); production callers build it
    once per table write and reuse it. On a z-ordered table this
    skips most files for a selective range on ANY interleaved
    dimension; correctness never depends on the manifest — the real
    filter still runs on what's read."""
    man = manifest if manifest is not None else build_stats_manifest(spark, path, [col])
    files = manifest_prune(man, col, lo, hi)
    if not files:
        return (
            spark.read.parquet(path).filter(F.col(col).between(lo, hi)).limit(0)
        )
    return spark.read.parquet(*files).filter(F.col(col).between(lo, hi))
