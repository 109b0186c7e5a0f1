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

from stream_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
