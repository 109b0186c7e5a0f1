"""Pipeline DSL: a JSON stage list compiled to a DataFrame plan.

The reference's central construct (pipeline/definition.go:12
DefinitionConfig{Stages}, pipeline/stage.go NewStage) is a linear list
of stages, each an activity with settings and input/output mappings,
evaluated per event. Here a pipeline is compiled ONCE into a
DataFrame-to-DataFrame composition — Catalyst sees the whole chain and
optimizes across stage boundaries (filter pushdown through the window
stage's shuffle, column pruning to the scan), which is the Spark-first
equivalent of flogo's per-event interpreter loop.

Stage types:

- ``filter``    — operators.filters (reference activity/filter)
- ``aggregate`` — operators.windows (reference activity/aggregate);
  settings mirror the reference schema: function, windowType
  (tumbling | sliding | timeTumbling | timeSliding), windowSize,
  resolution, plus value/groupBy/orderBy column bindings
- ``map``       — computed columns from SQL expressions (flogo's
  input/output mappings; Catalyst expressions, not UDFs)
- ``select``    — projection
- ``union``     — merge another pipeline's stream (README "join
  streams from multiple event sources")
- ``join``      — keyed join with another pipeline, optional time
  bound (stream-stream join)

Example::

    Pipeline.from_dict({
        "name": "simple_agg",
        "source": {"table": "events"},
        "stages": [
            {"type": "filter", "settings": {"type": "non-zero", "column": "value"}},
            {"type": "aggregate", "settings": {
                "function": "sum", "windowType": "timeTumbling",
                "windowSize": 5000, "value": "value"}},
        ],
    }).run(spark, sf_dir)
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.filters import apply_filter
from stream_spark.operators.windows import (
    sliding_count_window,
    sliding_time_window,
    tumbling_count_window,
    tumbling_time_window,
)
from stream_spark.sources import load_table


def _stage_filter(df: DataFrame, s: dict, ctx: "Pipeline", spark, sf_dir) -> DataFrame:
    kwargs = {k: v for k, v in s.items() if k not in ("type", "column")}
    return apply_filter(df, s["type"], s["column"], **kwargs)


def _stage_aggregate(df: DataFrame, s: dict, ctx: "Pipeline", spark, sf_dir) -> DataFrame:
    fn = s["function"]
    wtype = s["windowType"]
    size = int(s["windowSize"])
    # accept the reference's additionalSettings schema verbatim
    # (activity/aggregate README: nameKey → group key, valueKey → value)
    extra = s.get("additionalSettings", {})
    value = s.get("value", extra.get("valueKey", "value"))
    group_by = s.get("groupBy") or ([extra["nameKey"]] if "nameKey" in extra else None)
    order_by = s.get("orderBy", ("ts", "event_id"))
    resolution = int(s.get("resolution", 1))
    # proceedOnlyOnEmit is implicit in batch: windows emit only when
    # complete, and downstream stages see only emitted rows
    s.pop("proceedOnlyOnEmit", None)
    if wtype == "tumbling":
        return tumbling_count_window(df, value, fn, size, order_cols=order_by, group_by=group_by)
    if wtype == "sliding":
        return sliding_count_window(df, value, fn, size, resolution, order_cols=order_by, group_by=group_by)
    if wtype == "timeTumbling":
        return tumbling_time_window(df, s.get("ts", "ts"), value, fn, size, group_by=group_by)
    if wtype == "timeSliding":
        return sliding_time_window(df, s.get("ts", "ts"), value, fn, size, resolution, group_by=group_by)
    raise ValueError(f"unsupported windowType: {wtype!r}")


def _stage_map(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    for name, expr in s["exprs"].items():
        df = df.withColumn(name, F.expr(expr))
    return df


def _stage_select(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    return df.select(*s["columns"])


def _stage_union(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    other = Pipeline.from_dict(s["pipeline"]).run(spark, sf_dir)
    return df.unionByName(other)


def _stage_join(df: DataFrame, s: dict, ctx, spark, sf_dir) -> DataFrame:
    other = Pipeline.from_dict(s["pipeline"]).run(spark, sf_dir)
    for name, expr in s.get("right_exprs", {}).items():
        other = other.withColumn(name, F.expr(expr))
    cond = F.expr(s["on"])
    how = s.get("how", "inner")
    if s.get("broadcast"):
        # explicit user opt-in in the pipeline JSON: the author asserts
        # broadcast-ok: the joined side is a bounded dimension
        other = F.broadcast(other)
    return df.alias("l").join(other.alias("r"), cond, how)


STAGE_TYPES: dict[str, Callable] = {
    "filter": _stage_filter,
    "aggregate": _stage_aggregate,
    "map": _stage_map,
    "select": _stage_select,
    "union": _stage_union,
    "join": _stage_join,
}


class Pipeline:
    """A compiled stage chain; ``run`` materializes the DataFrame plan."""

    def __init__(self, name: str, source: dict[str, Any], stages: list[dict[str, Any]]):
        self.name = name
        self.source = source
        self.stages = stages
        for st in stages:
            if st["type"] not in STAGE_TYPES:
                raise ValueError(f"unsupported stage type: {st['type']!r}")

    @classmethod
    def from_dict(cls, config: dict[str, Any]) -> "Pipeline":
        return cls(config.get("name", "pipeline"), config["source"], config.get("stages", []))

    @classmethod
    def from_json(cls, text: str) -> "Pipeline":
        return cls.from_dict(json.loads(text))

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, self.source["table"], fmt=self.source.get("format", "parquet"))
        for st in self.stages:
            df = STAGE_TYPES[st["type"]](df, st.get("settings", {}), self, spark, sf_dir)
        return df
