"""Boundary-layout metadata-job probe (VERDICT r11 item 5): time the
two serial construction jobs (quantile boundaries, per-bucket counts)
against candidate fusions, on the count-window headliners' input
(events, order (ts, event_id)).

Variants:
  two_job   — the shipped spelling: percentile_approx collect, then a
              CASE-tree bucket groupBy collect (2 driver round trips).
  one_job   — ONE collect: the boundaries ride a 1-row cross join and
              the counts side buckets via an interpreted array-filter
              HOF over the bounds column (the §6-rejected per-row cost,
              but only on the counts job; saves a round trip).
  main_only — the main pass alone (scan → pid project → exchange →
              window), for the serial-floor decomposition.

Usage: python tools/probe_boundary.py <sf_dir> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from stream_spark.operators.rownum import (
        _key_boundaries,
        _pid_sql,
        _surrogate_sql,
        sized_partitions,
    )
    from stream_spark.session import get_spark
    from stream_spark.sources import load_table

    spark = get_spark("probe_boundary")
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, sf_dir, "events")
    n_parts = sized_partitions(df)
    skey = _surrogate_sql(df, "ts")
    print(f"# n_parts={n_parts}", file=sys.stderr)

    def timed(name, fn):
        fn()  # warm
        best = None
        for _ in range(reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)

    out: dict[str, float] = {}

    def quantile_job():
        return _key_boundaries(df, skey, n_parts)

    timed("quantile_job", quantile_job)

    bounds = _key_boundaries(df, skey, n_parts)
    pid = _pid_sql(bounds, skey)

    def counts_job():
        df.selectExpr(f"{pid} AS _pid").groupBy("_pid").count().collect()

    timed("counts_job", counts_job)

    def two_job():
        b = _key_boundaries(df, skey, n_parts)
        p = _pid_sql(b, skey)
        df.selectExpr(f"{p} AS _pid").groupBy("_pid").count().collect()

    timed("two_job_total", two_job)

    acc = max(1_000, min(100_000, 4 * n_parts))
    pcts = [i / n_parts for i in range(1, n_parts)]

    def one_job():
        b = (
            df.selectExpr(f"{skey} AS _k")
            .agg(F.percentile_approx("_k", pcts, acc).alias("_b"))
        )
        (
            df.selectExpr(f"{skey} AS _k")
            .crossJoin(F.broadcast(b))
            .selectExpr("size(filter(_b, x -> x < _k)) AS _pid")
            .groupBy("_pid")
            .count()
            .collect()
        )

    timed("one_job_total", one_job)

    # main pass alone: pid project + exchange + keyed window count
    from pyspark.sql import Window

    def main_pass():
        w = Window.partitionBy("_pid").orderBy("ts", "event_id")
        (
            df.selectExpr("*", f"{pid} AS _pid")
            .repartition(n_parts, F.col("_pid"))
            .withColumn("_lrn", F.row_number().over(w))
            .selectExpr("max(_lrn) AS m")
            .groupBy()
            .sum("m")
            .collect()
        )

    timed("main_pass", main_pass)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
