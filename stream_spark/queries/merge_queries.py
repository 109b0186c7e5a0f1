"""Table-maintenance queries: MERGE INTO / upsert under the oracle
gate.

The reference engine is stream-only; a training-data lakehouse also
maintains its tables. ``merge_upsert`` covers all three MERGE
branches in one plan (update, insert, delete); the partition-scoped
parquet rewrite is pytest-covered (tests/test_merge.py) since a sink
isn't a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.merge import merge_upsert
from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "orders_merge_upsert",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 7 <> 0
    ), u AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               o_totalprice + 10.0 AS o_totalprice,
               o_orderpriority, (o_orderkey % 15 = 0) AS del
        FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
           COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
    FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey
    WHERE NOT COALESCE(u.del, FALSE)
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE INTO, all three branches at once: a change set
    (keys %3) that UPDATES rows present in the target (keys %7≠0),
    INSERTS the ones that aren't, and DELETES keys %15. The oracle is
    the textbook full-outer-join spelling; the Spark plan is the
    algebraic max-of-struct aggregate (one shuffle carrying one row
    per key) from operators/merge.py."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    target = orders.filter(F.col("o_orderkey") % 7 != 0).select(*cols)
    updates = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
        "o_orderpriority",
        (F.col("o_orderkey") % 15 == 0).alias("_deleted"),
    )
    return merge_upsert(target, updates, ["o_orderkey"], delete_col="_deleted")


@register(
    "events_value_percentile_sampled",
    oracle="""
    WITH s AS (
        SELECT event_type, value, event_id
        FROM events
        WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 10000 < 2000
    ), r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM s
    )
    SELECT event_type,
           MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS p50,
           MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN value END) AS p90,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS p99
    FROM r GROUP BY event_type
    """,
)
def events_value_percentile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-but-deterministic quantiles: exact PERCENTILE_DISC
    over a 20% hash-of-id sample (operators/sketches.sampled_quantiles).
    Rank error is statistical; the VALUE is a pure function of the
    data, so unlike GK/t-digest it hash-matches across engines."""
    from stream_spark.operators.sketches import sampled_quantiles

    ev = load_table(spark, sf_dir, "events")
    return sampled_quantiles(
        ev, "value", "event_id", 0.2, (0.5, 0.9, 0.99), group_by=["event_type"]
    )


@register(
    "events_value_winsorized",
    oracle="""
    WITH r AS (
        SELECT event_type, value, event_id,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), cuts AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT) THEN value END) AS lo,
               MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN value END) AS hi
        FROM r GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(GREATEST(c.lo, LEAST(c.hi, e.value)) AS DECIMAL(18,4))) AS DOUBLE)
               AS winsorized_sum,
           CAST(SUM(CASE WHEN e.value < c.lo OR e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY e.event_type
    """,
)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust aggregation: winsorize value at per-group exact p1/p99
    (PERCENTILE_DISC rank spelling) and aggregate the clipped values in
    DECIMAL. Two passes over the group — the cuts aggregate is
    per-group tiny and joins back equi on the group key, so AQE
    broadcasts it; nothing corpus-sized moves twice."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"), F.col("value"))
    )
    cuts = r.groupBy("event_type").agg(pick(0.01).alias("lo"), pick(0.99).alias("hi"))
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return (
        ev.join(cuts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(clipped.cast("decimal(18,4)")).cast("double").alias("winsorized_sum"),
            F.sum(
                F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1)
                .otherwise(0)
            ).cast("long").alias("n_clipped"),
        )
    )


_AFF_B = 1024  # hashed-token buckets


@register(
    "documents_domain_affinity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(t.tok), 1, 15)) AS BIGINT) % {_AFF_B} AS b
        FROM (SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
              FROM documents) t
    ),
    target AS (SELECT b, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY b),
    raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b)
    SELECT t.doc_id,
           CAST(SUM(COALESCE(tg.ct, 0)) AS BIGINT) AS target_mass,
           CAST(SUM(r.cr) AS BIGINT) AS raw_mass,
           SUM(COALESCE(tg.ct, 0)) * 1.0 / SUM(r.cr) AS affinity
    FROM tok t
    JOIN raw r ON t.b = r.b
    LEFT JOIN target tg ON t.b = tg.b
    GROUP BY t.doc_id
    """,
)
def documents_domain_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-inspired domain scoring with hashed token buckets
    (Xie et al. 2023 use hashed-n-gram importance ratios): each doc is
    scored by how much of its token mass falls in buckets the TARGET
    domain (lang='en') favors — affinity = Σ target-bucket-count /
    Σ corpus-bucket-count over the doc's tokens. A ratio of two BIGINT
    sums, not a product of logs, so it hash-matches across engines
    (libm log ulps don't). The bucket tables are ≤ {_AFF_B} rows —
    broadcastable by construction at any corpus size."""
    from stream_spark.operators.text import md5_long, tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("_tok")
    ).select("doc_id", "lang", (md5_long(F.col("_tok")) % _AFF_B).alias("b"))
    target = tok.filter(F.col("lang") == "en").groupBy("b").agg(F.count("*").alias("ct"))
    raw = tok.groupBy("b").agg(F.count("*").alias("cr"))
    j = tok.join(raw, "b").join(target, "b", "left").na.fill(0, ["ct"])
    return j.groupBy("doc_id").agg(
        F.sum("ct").cast("long").alias("target_mass"),
        F.sum("cr").cast("long").alias("raw_mass"),
        (F.sum("ct") * F.lit(1.0) / F.sum("cr")).alias("affinity"),
    )


def _z_terms_sql(a: str, b: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "events_zorder_key",
    oracle=f"""
    WITH base AS (
        SELECT event_id,
               user_id % 256 AS a,
               (epoch_ms(ts) // 3600000) % 256 AS b
        FROM events
    )
    SELECT event_id, CAST({_z_terms_sql('a', 'b', 8)} AS BIGINT) AS zkey
    FROM base
    """,
)
def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (user_id, hour) — the
    data-skipping layout primitive (operators/layout.py). Pure literal
    bit arithmetic, identical in both engines; the physical write path
    (range repartition on the key → narrow per-row-group min/max on
    BOTH dimensions) is pytest-asserted against parquet row-group
    stats in tests/test_merge.py."""
    from stream_spark.operators.layout import zorder_key

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("a"),
        ((F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(3600000)).cast("long") % 256).alias("b"),
    )
    return base.select("event_id", zorder_key([F.col("a"), F.col("b")], bits=8).alias("zkey"))


@register(
    "orders_snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
           END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
               WHEN n.o_orderkey IS NULL THEN 'removed'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
          END IS NOT NULL
    """,
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions (operators/merge.
    table_diff): the new version is derived deterministically in-query
    (every 97th key deleted, every 11th price bumped, every 13th key
    re-inserted under an offset id). One keyed full-outer join with
    null-safe column compare — output bounded by the churn."""
    from stream_spark.operators.merge import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 11 == 0, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 13 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(1_000_000_000)
            )
        )
    )
    return table_diff(orders, new, ["o_orderkey"])


@register(
    "orders_rollup_incremental",
    oracle="""
    SELECT CAST(epoch_ms(date_trunc('day', o_orderdate)) AS BIGINT) AS day_ms,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY day_ms
    """,
)
def orders_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily rollup is
    kept as an algebraic STATE table (count, decimal sum) and a new
    batch merges by re-aggregating base-state ∪ delta-state — never
    re-reading history. Here the split is derived in-query (base =
    even order keys, delta = odd) and the oracle is the FULL recompute:
    merged partials must equal it exactly, which is the entire point
    of decomposable aggregates (CLAUDE.md rule 1 makes the sums
    order-insensitive, so base+delta order cannot matter)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.unix_millis(F.date_trunc("day", F.col("o_orderdate")).cast("timestamp"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(day.alias("day_ms")).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("_rev_state"),
        )

    base = partial(orders.filter(F.col("o_orderkey") % 2 == 0))
    delta = partial(orders.filter(F.col("o_orderkey") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("day_ms")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            # decimal(18,4) partial sums re-sum exactly; Spark widens the
            # sum's precision internally, cast back before the double
            F.sum("_rev_state").cast("decimal(28,4)").cast("double").alias("revenue"),
        )
    )
    return merged
