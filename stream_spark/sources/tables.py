"""Batch sources: the driver-generated parquet star schema.

Parquet is the primary source (columnar, predicate-pushdown friendly).
CSV/JSON loaders share the same entry point so pipelines are
format-agnostic — the reference's trigger/streamtester (dataset.go)
plays a CSV dataset into the pipeline; here any format lands in the
same DataFrame shape.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pyarrow.types as patypes
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast in joins.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def _read_parquet_ns_safe(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet whose timestamps may be TIMESTAMP(NANOS).

    Spark has no nanosecond timestamp type and rejects such files
    unless nanos are surfaced as longs; we convert those columns back
    to real timestamps via integer division (ns epoch values exceed
    double precision, so `DIV`, never `/`). DuckDB truncates ns→µs the
    same way, keeping oracle parity exact.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    schema_path = path
    if os.path.isdir(path):  # multi-file table (e.g. the derived sf1 probe set)
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
        )
        schema_path = os.path.join(path, parts[0])
    schema = pq.read_schema(schema_path)
    for field in schema:
        if patypes.is_timestamp(field.type) and field.type.unit == "ns":
            # INT96 timestamps (Spark's own writer default) surface as
            # ns in pyarrow but load as real TIMESTAMPs in Spark — only
            # TIMESTAMP(NANOS) files actually arrive as longs under
            # nanosAsLong, so gate the conversion on the loaded dtype.
            if not df.schema[field.name].dataType.typeName().startswith("long"):
                continue
            df = df.withColumn(
                field.name,
                F.expr(f"timestamp_micros(CAST(`{field.name}` DIV 1000 AS BIGINT))"),
            )
    # tz-naive parquet timestamps surface as TIMESTAMP_NTZ, which
    # Structured Streaming watermarks reject. Session tz is pinned UTC,
    # so casting NTZ -> LTZ preserves every wall-clock value while
    # restoring the event-time-capable type (DuckDB reads the same
    # files as naive timestamps — parity is unchanged).
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


#: Timestamp format used for text formats: Spark's CSV/JSON default
#: keeps only milliseconds; the µs pattern round-trips parquet-derived
#: timestamps exactly (testdata is ns, truncated to µs on load).
TEXT_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def load_table(spark: SparkSession, sf_dir: str, name: str, fmt: str = "parquet", schema=None) -> DataFrame:
    """Format-agnostic table loader. For text formats pass ``schema``
    for deterministic types (inference is sampling-based and can drift
    between runs/scales)."""
    path = os.path.join(sf_dir, f"{name}.{ 'parquet' if fmt == 'parquet' else fmt}")
    if fmt == "parquet":
        return _read_parquet_ns_safe(spark, path)
    if fmt == "csv":
        r = spark.read.option("header", "true").option("timestampFormat", TEXT_TS_FMT)
        r = r.schema(schema) if schema is not None else r.option("inferSchema", "true")
        return r.csv(path)
    if fmt == "json":
        r = spark.read.option("timestampFormat", TEXT_TS_FMT)
        if schema is not None:
            r = r.schema(schema)
        return r.json(path)
    if fmt == "orc":
        # columnar like parquet: schema travels with the file, and
        # predicate pushdown / column pruning apply, so no schema arg
        return spark.read.orc(path)
    raise ValueError(f"unsupported format: {fmt}")


def stage_table_as(spark: SparkSession, sf_dir: str, name: str, fmt: str, stage_root: str) -> DataFrame:
    """Rewrite a parquet table as CSV/JSON under ``stage_root`` and
    load it back through ``load_table(fmt=...)`` with the original
    schema — the text-format ingestion path, fed from the same rows so
    oracle queries can check it against the parquet views."""
    src = load_table(spark, sf_dir, name)
    os.makedirs(stage_root, exist_ok=True)
    path = os.path.join(stage_root, f"{name}.{fmt}")
    writer = src.write.mode("overwrite").option("timestampFormat", TEXT_TS_FMT)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported staging format: {fmt}")
    return load_table(spark, stage_root, name, fmt=fmt, schema=src.schema)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def pid_scoped_table(spark, base: str) -> str:
    """Per-pid warehouse table name (``{base}_{pid}``) with the same
    two hygiene rules as the per-pid staging dirs: sibling table dirs
    left by DEAD pids are swept at allocation time (concurrent oracle
    shards / pytest / bench each allocate fresh names — without the
    sweep the warehouse accumulates unboundedly; the in-memory catalog
    of a dead session holds no entry, only orphan files), and any
    same-pid leftover catalog entry is dropped so the caller starts
    clean."""
    import os
    import re
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh_path = wh[len("file:"):] if wh.startswith("file:") else wh
    pat = re.compile(re.escape(base) + r"_(\d+)$")
    try:
        for d in os.listdir(wh_path):
            m = pat.match(d)
            if m and int(m.group(1)) != os.getpid() and not os.path.exists(f"/proc/{m.group(1)}"):
                shutil.rmtree(os.path.join(wh_path, d), ignore_errors=True)
    except OSError:
        pass
    name = f"{base}_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    return name


def write_bucketed(
    df,
    table_name: str,
    bucket_col: str | list[str],
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on a join key.

    Bucketing is the 100 TB fact-fact join strategy: two tables
    bucketed on the same key with the same bucket count join with NO
    exchange — each task reads matching bucket files from both sides.
    At cluster scale the write targets the metastore; locally it lands
    in ``spark.sql.warehouse.dir``. ``bucket_col`` may be a list when
    the join key is composite (e.g. the dedup index's (band, bucket))
    — the planner only uses a bucketed read whose bucket columns match
    the join keys; a single-column bucket layout under a two-key join
    is disabled with "Bucketed: false"."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *cols)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
