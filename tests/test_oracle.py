"""Fast local version of the driver's correctness gate (SURVEY §5).

Runs every registered query against its DuckDB oracle at sf0.001 using
the same comparison logic as tools/check_oracle.py. The full-size gate
(sf0.01) stays in tools/check_oracle.py; this keeps a pytest-visible
canary so an oracle regression fails `pytest tests/` immediately.

Set SPARK_GRAFT_ORACLE_FULL=0 to restrict to a smoke subset.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from stream_spark.queries import ORACLES, QUERIES
from tools.check_oracle import compare

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# A representative smoke subset covering each query family, used when the
# full sweep is disabled.
SMOKE = [
    "tpch_q1_pricing_summary",
    "agg_tumbling_count_sum",
    "agg_time_sliding_avg",
    "agg_tumbling_count_accumulate",
    "events_sessionize",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality_score",
    "ann_topk_bruteforce",
    "training_data_prep",
    "embeddings_kmeans",
    "training_pack_sequences",
    "dedup_clusters",
    "pipeline_dedup_sample",
]

_full = os.environ.get("SPARK_GRAFT_ORACLE_FULL", "1") != "0"
NAMES = sorted(QUERIES) if _full else SMOKE


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute("SET enable_progress_bar=false")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle(name, spark, sf_dir, duck):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only ({len(spark_pdf)} rows)")
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
