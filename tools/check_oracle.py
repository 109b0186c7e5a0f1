"""Local replica of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle at the
given sf dir, then compares row count, column names, and
order-insensitive values (exact for ints/strings, exact-match expected
for our decimal-routed doubles). Usage:

    python tools/check_oracle.py [sf_dir] [query ...] [--shard=i/n] [--json=PATH]

``--json=PATH`` additionally writes a driver-format per-query record
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err) for every query run — the committed full-registry evidence the
driver's 50-query sample doesn't cover (VERDICT r6 item 3). Queries
with no SQL oracle carry ``"rows_only": true`` plus, where the gap is
a documented design decision rather than missing work, an explicit
``"exemption"`` reason (VERDICT r7 item 4) so no consumer diffing for
all-three-green can misread the entry as a failure. Written atomically
(tmp + rename) so a snapshot mid-run never commits a torn artifact.
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


# Deliberately oracle-exempt queries: key -> reason stamped into the
# --json artifact. These are design decisions (documented in SURVEY §2),
# not coverage gaps; each has a pytest-tier correctness story instead.
EXEMPTIONS = {
    # d×d eigendecomposition is not SQL-expressible; numpy-parity pytest
    # (tests/test_pca.py) covers reconstruction + orthonormality instead.
    "embeddings_pca_project": "eigendecomposition-pytest-tier",
}


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
    json_path = None
    for a in sys.argv[1:]:
        if a.startswith("--shard="):
            i, n = a.split("=", 1)[1].split("/")
            shard = (int(i), int(n))
        elif a.startswith("--json="):
            json_path = a.split("=", 1)[1]

    from stream_spark.queries import ORACLES, QUERIES
    from stream_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    records: dict[str, dict] = {}
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
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark: {type(spark_err).__name__}: {spark_err}",
            }
            continue
        if name not in ORACLES:
            note = f" (exempt: {EXEMPTIONS[name]})" if name in EXEMPTIONS else ""
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows){note} [{time.time()-t0:.1f}s]")
            records[name] = {
                "rows_only": True, "spark_rows": len(spark_pdf),
                "oracle_rows": None, "err": None,
            }
            if name in EXEMPTIONS:
                records[name]["exemption"] = EXEMPTIONS[name]
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(spark_pdf), "oracle_rows": None,
                "err": f"duckdb: {type(e).__name__}: {e}",
            }
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        records[name] = {
            "rows_match": len(spark_pdf) == len(duck_pdf),
            "schema_match": sorted(spark_pdf.columns) == sorted(duck_pdf.columns),
            "hash_match": not problems,
            "spark_rows": len(spark_pdf),
            "oracle_rows": len(duck_pdf),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    exempt = sorted(k for k in records if "exemption" in records[k])
    suffix = f" ({len(exempt)} documented exemption(s): {', '.join(exempt)})" if exempt else ""
    print(f"\n{'ALL GREEN' + suffix if failures == 0 else f'{failures} FAILURES'}")
    if json_path:
        import json

        tmp = json_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(records, fh, indent=2)
            fh.write("\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, json_path)
        print(f"wrote {json_path} ({len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
