"""Corpus statistics, redaction, sketch evaluation, and funnel
analytics — the long tail of a real training-data/stream-analytics
deployment."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stream_spark.operators.dedup import (
    MERSENNE31,
    PERMS,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_docs,
)
from stream_spark.queries.dedup_queries import _SHINGLES3, _MH_PERM
from stream_spark.queries.registry import register
from stream_spark.sources import load_table


@register(
    "corpus_top_ngrams",
    oracle=f"""
    WITH {_SHINGLES3}
    SELECT g, COUNT(*) AS df
    FROM sh GROUP BY g
    ORDER BY df DESC, g
    LIMIT 25
    """,
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency of word 3-grams, top 25 (deterministic
    tie-break on the gram). The groupBy is the inverted-index build —
    the same shuffle dedup rides on."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_docs(docs)
    return sh.groupBy("g").agg(F.count("*").alias("df")).orderBy(F.col("df").desc(), F.col("g")).limit(25)


@register(
    "text_redact_patterns",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                              '[a-z]+@[a-z]+', '<EMAIL>', 'g')) AS redacted_md5,
           length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS redacted_len
    FROM documents
    """,
)
def text_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing (numbers, email-ish tokens) — a PII-redaction
    stand-in; output is the md5 of the redacted text so the oracle
    proves byte-identical rewriting."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(F.regexp_replace(F.col("text"), r"[0-9]+", "<NUM>"), r"[a-z]+@[a-z]+", "<EMAIL>")
    return docs.select(
        "doc_id",
        F.md5(redacted).alias("redacted_md5"),
        F.length(F.regexp_replace(F.col("text"), r"[0-9]+", "<NUM>")).cast("long").alias("redacted_len"),
    )


@register(
    "minhash_jaccard_estimate",
    oracle=f"""
    WITH {_SHINGLES3},
    h AS (
        SELECT doc, p, MIN({_MH_PERM}) AS mh
        FROM sh, unnest(generate_series(0, {PERMS - 1})) t(p)
        GROUP BY doc, p
    ),
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    co AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    ),
    true_pairs AS (
        SELECT doc_a, doc_b, common / (sa.sz + sb.sz - common) AS jaccard
        FROM co JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
        WHERE common / (sa.sz + sb.sz - common) >= 0.8
    )
    SELECT t.doc_a, t.doc_b, t.jaccard,
           (SELECT COUNT(*) FROM h x JOIN h y
             ON x.doc = t.doc_a AND y.doc = t.doc_b AND x.p = y.p AND x.mh = y.mh)
           / {PERMS}.0 AS jaccard_est
    FROM true_pairs t
    """,
)
def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality evaluation: true Jaccard vs the minhash estimate
    (fraction of agreeing permutations) for every true near-dup pair."""
    docs = load_table(spark, sf_dir, "documents")
    true_pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    sigs = minhash_signatures(docs)
    sa = sigs.select(F.col("doc").alias("doc_a"), *[F.col(f"mh{p}").alias(f"a{p}") for p in range(PERMS)])
    sb = sigs.select(F.col("doc").alias("doc_b"), *[F.col(f"mh{p}").alias(f"b{p}") for p in range(PERMS)])
    agree = sum(F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0) for p in range(PERMS))
    # sigs is one row per DOCUMENT (O(corpus)) — shuffle joins on the
    # doc id, never a broadcast hint; AQE can still pick broadcast at
    # small SF after measuring the build side
    return (
        true_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_est", agree / F.lit(float(PERMS)))
        .select("doc_a", "doc_b", "jaccard", "jaccard_est")
    )


@register(
    "agg_time_tumbling_distinct_users",
    oracle="""
    SELECT CAST((epoch_ms(ts) // 21600000) * 21600000 AS BIGINT) AS window_start_ms,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY window_start_ms
    """,
)
def agg_time_tumbling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "21600000 milliseconds").alias("w"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(F.unix_millis(F.col("w.start").cast("timestamp")).alias("window_start_ms"), "n_users")
    )


@register(
    "events_funnel_click_purchase",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(first_click) AS n_clicked,
           CAST(SUM(CASE WHEN first_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM firsts
    """,
)
def events_funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion funnel: per-user first-touch times via
    conditional MIN (one shuffle), then global counts."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("first_click").alias("n_clicked"),
        F.sum(F.when(F.col("first_purchase") > F.col("first_click"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted"),
    )
