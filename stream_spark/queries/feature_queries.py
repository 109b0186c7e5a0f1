"""Feature-store / data-curation queries: point-in-time correctness,
embedding-space diagnostics, and classifier-based quality filtering.

The point-in-time (PIT) join is the training-data-correctness shape:
joining a fact to the dimension version that was valid AT THE FACT'S
event time — never a later one — is what prevents label leakage when
features are assembled for supervised training. Reference engines ship
it as `ASOF JOIN` / temporal tables; here it is an interval join
against SCD2 validity windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "events_pit_dimension_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, value AS dim_value,
               ts AS vf,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                   AS dim_version
        FROM events WHERE event_type = 'view'
    )
    SELECT f.event_id, f.user_id,
           CAST(epoch_ms(f.ts) AS BIGINT) AS ts_ms,
           d.dim_version, d.dim_value,
           CAST(epoch_ms(d.vf) AS BIGINT) AS dim_since_ms
    FROM events f
    LEFT JOIN dim d
      ON f.user_id = d.user_id AND f.ts >= d.vf AND (d.vt IS NULL OR f.ts < d.vt)
    WHERE f.event_type = 'purchase'
    """,
)
def events_pit_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase is enriched with the user-state
    version (built SCD2-style from 'view' events, half-open validity
    intervals [ts, next_ts)) that was valid AT the purchase's event
    time — the feature-store shape that prevents label leakage in
    training-data assembly.

    Exactly one interval can match a purchase (the intervals partition
    [first_view, inf) per user; a same-(user,ts) view pair yields one
    zero-length interval that matches nothing, so the (ts, event_id)
    tie-break is deterministic in both engines). Purchases before the
    user's first view survive with NULL state (left join).

    Scale: one keyed window builds the intervals (partition by user,
    never global), then a left equi-join ON user_id with the range
    residual — per-key fan-out is bounded by that user's version
    count, and AQE skew-splitting covers hot users. At extreme
    versions-per-key the two-frame as-of primitive
    (events_asof_nearest_click) is the fallback shape.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("_duid"),
            F.col("value").alias("dim_value"),
            F.col("ts").alias("_vf"),
            F.lead("ts").over(w).alias("_vt"),
            F.row_number().over(w).cast("long").alias("dim_version"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase")
    return (
        fact.join(
            dim,
            (fact["user_id"] == dim["_duid"])
            & (fact["ts"] >= dim["_vf"])
            & (dim["_vt"].isNull() | (fact["ts"] < dim["_vt"])),
            "left",
        )
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            "dim_version",
            "dim_value",
            F.unix_millis(F.col("_vf").cast("timestamp")).alias("dim_since_ms"),
        )
    )
