from stream_spark.functions.aggregates import AGG_FUNCTIONS, agg_expr

__all__ = ["AGG_FUNCTIONS", "agg_expr"]
