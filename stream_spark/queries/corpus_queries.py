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


from stream_spark.operators.dedup import containment_pairs  # noqa: E402
from stream_spark.operators.text import normalize_text, tokens  # noqa: E402
from stream_spark.queries.dedup_queries import NORM  # noqa: E402


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES3},
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    co AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           common / sa.sz AS containment_ab,
           common / sb.sz AS containment_ba
    FROM co JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
    WHERE common / sa.sz >= 0.6 OR common / sb.sz >= 0.6
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (|A∩B|/|A| ≥ 0.6 in
    either direction) — the quote/snippet-inclusion detector that
    symmetric Jaccard misses."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.6)


@register(
    "corpus_tfidf_top_terms",
    oracle=f"""
    WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
    t AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term FROM n),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM t GROUP BY term),
    scored AS (
        SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
        FROM tf JOIN dfreq USING (term)
    )
    SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf/df weighting.

    tf/df ranks identically to tf·idf with a linear inverse-frequency
    weight; the linear surrogate (no log) keeps the score exact
    rational arithmetic so the oracle hash-matches (JVM log is not
    bit-portable across engines — same policy as text_char_diversity).
    Two keyed aggregations (doc,term) and (term), one shuffle join on
    the term, per-doc window for top-k — every stage keyed, no global
    ordering.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(tokens(normalize_text(F.col("text")))).alias("term")
    )
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = t.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
