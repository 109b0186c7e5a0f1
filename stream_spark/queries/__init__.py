"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where expressible) an
equivalent ANSI-SQL oracle for DuckDB.

Determinism conventions (so value hashes match the oracle exactly):
- numeric aggregates accumulate in DECIMAL (exact, order-insensitive)
  and the final column is cast to DOUBLE on both sides;
- timestamps are emitted as epoch milliseconds (BIGINT) to avoid
  timezone/representation drift;
- every computed column is aliased identically in Spark and SQL.
"""

from stream_spark.queries.registry import ORACLES, QUERIES, register

# import for registration side effects
from stream_spark.queries import analytics as _analytics  # noqa: E402,F401
from stream_spark.queries import window_queries as _window_queries  # noqa: E402,F401
from stream_spark.queries import dedup_queries as _dedup_queries  # noqa: E402,F401
from stream_spark.queries import text_queries as _text_queries  # noqa: E402,F401
from stream_spark.queries import ann_queries as _ann_queries  # noqa: E402,F401
from stream_spark.queries import pipeline_queries as _pipeline_queries  # noqa: E402,F401
from stream_spark.queries import advanced_queries as _advanced_queries  # noqa: E402,F401
from stream_spark.queries import tpch_extra as _tpch_extra  # noqa: E402,F401
from stream_spark.queries import corpus_queries as _corpus_queries  # noqa: E402,F401
from stream_spark.queries import streaming_queries as _streaming_queries  # noqa: E402,F401
from stream_spark.queries import source_queries as _source_queries  # noqa: E402,F401
from stream_spark.queries import chunk_queries as _chunk_queries  # noqa: E402,F401
from stream_spark.queries import merge_queries as _merge_queries  # noqa: E402,F401
from stream_spark.queries import quality_queries as _quality_queries  # noqa: E402,F401
from stream_spark.queries import feature_queries as _feature_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
