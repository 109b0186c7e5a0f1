"""stream_spark — a PySpark-native analytics/stream-processing engine.

Re-expresses the capabilities of the reference Go engine
(project-flogo/stream: windowed aggregation, filters, pipeline DSL,
stream merge/join, replay trigger) on the Spark DataFrame / Structured
Streaming stack, plus large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design: declare logical plans with the DataFrame API and let Catalyst /
Tungsten pick physical strategies. Python stays on the driver; all row
work is JVM-side `pyspark.sql.functions` unless a Pandas UDF is
genuinely required (multimodal decode stubs).
"""

from stream_spark.operators.clustering import kmeans_assign
from stream_spark.operators.components import (
    connected_components,
    connected_components_star,
    pagerank_integer,
)
from stream_spark.operators.dedup import (
    exact_dedup,
    incremental_dedup_flags,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from stream_spark.operators.asof import asof_join, asof_join_cogrouped
from stream_spark.operators.layout import (
    build_stats_manifest,
    manifest_prune,
    read_parquet_range,
    zorder_key,
    zorder_write,
)
from stream_spark.operators.merge import (
    compact_partitioned_parquet,
    merge_upsert,
    upsert_partitioned_parquet,
)
from stream_spark.operators.packing import pack_sequences
from stream_spark.operators.rangejoin import range_join
from stream_spark.operators.sampling import (
    deterministic_sample,
    mix_corpus,
    stratified_sample,
)
from stream_spark.operators.similarity import (
    cosine_pairs_lsh,
    topk_bruteforce,
    topk_ivf,
    topk_lsh,
)
from stream_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    freq_items,
    sampled_quantiles,
    tdigest_quantiles,
)
from stream_spark.operators.text import (
    boilerplate_share,
    decontaminate,
    fingerprint,
    gopher_rules,
    langid,
    quality_features,
    repetition_features,
)
from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)
from stream_spark.pipeline import Pipeline, TelemetryService, register_telemetry_service
from stream_spark.session import get_spark
from stream_spark.sources import load_table

__all__ = [
    "Pipeline",
    "TelemetryService",
    "approx_distinct",
    "approx_quantiles",
    "asof_join",
    "asof_join_cogrouped",
    "boilerplate_share",
    "build_stats_manifest",
    "compact_partitioned_parquet",
    "connected_components",
    "connected_components_star",
    "cosine_pairs_lsh",
    "decontaminate",
    "deterministic_sample",
    "exact_dedup",
    "fingerprint",
    "freq_items",
    "get_spark",
    "gopher_rules",
    "incremental_dedup_flags",
    "kmeans_assign",
    "langid",
    "load_table",
    "manifest_prune",
    "merge_upsert",
    "minhash_lsh_candidates",
    "mix_corpus",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pagerank_integer",
    "quality_features",
    "range_join",
    "read_parquet_range",
    "register_telemetry_service",
    "repetition_features",
    "sampled_quantiles",
    "simhash_pairs",
    "sliding_count_window",
    "sliding_time_window",
    "stratified_sample",
    "tdigest_quantiles",
    "topk_bruteforce",
    "topk_ivf",
    "topk_lsh",
    "tumbling_count_window",
    "tumbling_time_window",
    "upsert_partitioned_parquet",
    "zorder_key",
    "zorder_write",
]
__version__ = "0.3.0"
