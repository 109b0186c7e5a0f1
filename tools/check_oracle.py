"""Local replica of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the
given sf dir, then compares row count, column names, and
order-insensitive values (exact for ints/strings, exact-match expected
for our decimal-routed doubles). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def _norm_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    if len(s) == len(d):
        for c in s.columns:
            sv, dv = s[c].tolist(), d[c].tolist()
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(sv, dv))
                if a != b and not (isinstance(a, float) and isinstance(b, float) and (a == b or abs(a - b) < 1e-12))
            ]
            if bad:
                problems.append(f"col {c}: {len(bad)} mismatches, first={bad[0]}")
    return problems


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    shard = None  # --shard=i/n runs the i-th of n registry slices (long sf0.1 runs)
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            i, n = a.split("=", 1)[1].split("/")
            shard = (int(i), int(n))

    from stream_spark.queries import ORACLES, QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for qi, (name, fn) in enumerate(QUERIES.items()):
        if only and name not in only:
            continue
        if shard is not None and qi % shard[1] != shard[0]:
            continue
        t0 = time.time()
        spark_err = None
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            spark_err = e
        finally:
            # a streaming query that outlived its gate entry (e.g. a
            # timed-out availableNow job) would bleed scheduler slots
            # into every later query — reap strays between entries
            for sq in spark.streams.active:
                sq.stop()
        if spark_err is not None:
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
