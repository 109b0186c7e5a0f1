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


from stream_spark.queries.text_queries import TOKS as _Q_TOKS, _STOP_IN as _Q_STOP  # noqa: E402

_QS = f"""
    feat AS (
        SELECT doc_id,
               CAST(len({_Q_TOKS}) AS BIGINT) AS n_tokens,
               CAST(len(list_filter({_Q_TOKS}, w -> w IN ({_Q_STOP}))) AS BIGINT) AS n_stopwords,
               length(text) AS n_char,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 0.4 ELSE 0.0 END
                + CASE WHEN n_stopwords / n_tokens >= 0.05 THEN 0.3 ELSE 0.0 END
                + CASE WHEN n_digit / n_char <= 0.2 THEN 0.2 ELSE 0.0 END
                + CASE WHEN n_punct / n_char <= 0.1 THEN 0.1 ELSE 0.0 END) AS qs
        FROM feat
    )
"""


@register(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES3},
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    co AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    ),
    edges AS (
        SELECT doc_a, doc_b FROM co
        JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
        WHERE common / (sa.sz + sb.sz - common) >= 0.8
    ),
    und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges),
    reach(node, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    {_QS},
    mem AS (SELECT c.component, c.node AS doc_id, q.qs
            FROM comp c JOIN q ON q.doc_id = c.node),
    r AS (SELECT component, doc_id, qs,
                 COUNT(*) OVER (PARTITION BY component) AS cluster_size,
                 row_number() OVER (PARTITION BY component ORDER BY qs DESC, doc_id) AS rn
          FROM mem)
    SELECT doc_id AS keeper_doc_id, qs AS keeper_quality,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM r WHERE rn = 1
    UNION ALL
    SELECT d.doc_id, q.qs, CAST(1 AS BIGINT)
    FROM documents d JOIN q ON q.doc_id = d.doc_id
    WHERE d.doc_id NOT IN (SELECT node FROM comp)
    """,
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-grade dedup: near-dup clusters keep their HIGHEST-
    quality member, not the lowest id — what a production corpus
    actually wants (the canonical page, not the first-crawled copy).
    Composes the Jaccard pair graph → star components → one keyed
    max(struct(quality, -id)) argmax per component (deterministic:
    quality desc, id asc); singletons keep themselves. Same shuffle
    profile as dedup_clusters plus one map-side-combinable argmax."""
    from stream_spark.operators.components import connected_components_star
    from stream_spark.operators.dedup import ngram_jaccard_pairs
    from stream_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8)
    comps = connected_components_star(pairs)
    q = quality_features(docs).select("doc_id", F.col("quality_score").alias("qs"))
    mem = comps.join(q, comps.node == q.doc_id)
    grouped = (
        mem.groupBy("component")
        .agg(
            F.max(F.struct(F.col("qs").alias("qs"), (-F.col("doc_id")).alias("negid"))).alias("mx"),
            F.count("*").alias("cluster_size"),
        )
        .select(
            (-F.col("mx.negid")).cast("long").alias("keeper_doc_id"),
            F.col("mx.qs").alias("keeper_quality"),
            F.col("cluster_size").cast("long"),
        )
    )
    singles = (
        docs.select("doc_id")
        .join(comps.select(F.col("node").alias("doc_id")), "doc_id", "left_anti")
        .join(q, "doc_id")
        .select(
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("qs").alias("keeper_quality"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    )
    return grouped.unionByName(singles)


from stream_spark.queries.dedup_queries import _BANDED_EDGES_CTES  # noqa: E402


@register(
    "dedup_keep_best_quality_banded",
    oracle=f"""
    WITH RECURSIVE {_BANDED_EDGES_CTES},
    und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM verified
            UNION ALL SELECT doc_b, doc_a FROM verified),
    reach(node, label) AS (
        SELECT src, src FROM und
        UNION
        SELECT u.dst, r.label FROM reach r JOIN und u ON u.src = r.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
    {_QS},
    mem AS (SELECT c.component, c.node AS doc_id, q.qs
            FROM comp c JOIN q ON q.doc_id = c.node),
    r AS (SELECT component, doc_id, qs,
                 COUNT(*) OVER (PARTITION BY component) AS cluster_size,
                 row_number() OVER (PARTITION BY component ORDER BY qs DESC, doc_id) AS rn
          FROM mem)
    SELECT doc_id AS keeper_doc_id, qs AS keeper_quality,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM r WHERE rn = 1
    UNION ALL
    SELECT d.doc_id, q.qs, CAST(1 AS BIGINT)
    FROM documents d JOIN q ON q.doc_id = d.doc_id
    WHERE d.doc_id NOT IN (SELECT node FROM comp)
    """,
)
def dedup_keep_best_quality_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_keep_best_quality`` with the band-candidate edge
    generator — the crawl-scale default (see dedup_clusters_banded for
    the asymptotics: band-collision-bounded candidates instead of
    Σ freq(shingle)², edges still exact-Jaccard-verified ≥ 0.8 over
    the full shingle sets). Same quality argmax per component;
    singletons keep themselves."""
    from stream_spark.operators.components import connected_components_star
    from stream_spark.operators.dedup import banded_jaccard_pairs
    from stream_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    pairs = banded_jaccard_pairs(docs, threshold=0.8)
    comps = connected_components_star(pairs)
    q = quality_features(docs).select("doc_id", F.col("quality_score").alias("qs"))
    mem = comps.join(q, comps.node == q.doc_id)
    grouped = (
        mem.groupBy("component")
        .agg(
            F.max(F.struct(F.col("qs").alias("qs"), (-F.col("doc_id")).alias("negid"))).alias("mx"),
            F.count("*").alias("cluster_size"),
        )
        .select(
            (-F.col("mx.negid")).cast("long").alias("keeper_doc_id"),
            F.col("mx.qs").alias("keeper_quality"),
            F.col("cluster_size").cast("long"),
        )
    )
    singles = (
        docs.select("doc_id")
        .join(comps.select(F.col("node").alias("doc_id")), "doc_id", "left_anti")
        .join(q, "doc_id")
        .select(
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("qs").alias("keeper_quality"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    )
    return grouped.unionByName(singles)


def _bpe_oracle(rounds: int) -> str:
    """Replay BPE merge induction: per round, adjacent-pair count →
    deterministic top-1 → greedy left-to-right list_reduce application
    (wrapped elements keep the accumulator VARCHAR[]; ≤1-token docs
    skip the fold — list_reduce rejects empty input)."""
    ctes = [
        """t0 AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), tk -> length(tk) > 0) AS toks
        FROM documents
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""p{r} AS (
        SELECT toks[i] AS a, toks[i + 1] AS b, COUNT(*) AS c
        FROM t{r - 1}, unnest(generate_series(1, len(toks) - 1)) s(i)
        GROUP BY 1, 2
    ),
    m{r} AS (SELECT a, b, a || ' ' || b AS mm, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1)""")
        if r < rounds:
            ctes.append(f"""t{r} AS (
        SELECT doc_id,
               CASE WHEN len(toks) <= 1 THEN toks
                    ELSE list_reduce(list_transform(toks, x -> [x]),
                         (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                                          THEN list_append(acc[:len(acc) - 1], m.mm)
                                          ELSE list_append(acc, x[1]) END)
               END AS toks
        FROM t{r - 1}, m{r} m
    )""")
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a AS tok_a, b AS tok_b, CAST(c AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + sel


_BPE_ROUNDS = 3


@register("corpus_bpe_merges", oracle=_bpe_oracle(_BPE_ROUNDS))
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE-style tokenizer induction (Sennrich et al.
    2016): {_BPE_ROUNDS} rounds of most-frequent-adjacent-pair merge,
    each applied corpus-wide (greedy left-to-right Catalyst fold)
    before the next count — the iterative-algorithm shape under the
    exact oracle gate, like PageRank and k-means. The learned merge
    table is the output. Per round: one pair-keyed shuffle + one
    bounded top-1; rule application is a map-only fold, rules stay
    1-row broadcast frames (no driver round trip)."""
    from stream_spark.operators.bpe import bpe_merge_rounds
    from stream_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0).alias("toks")
    )
    return bpe_merge_rounds(toked, rounds=_BPE_ROUNDS)


_DRIFT_V = 128


@register(
    "corpus_token_drift",
    oracle=f"""
    WITH tok AS (
        SELECT source, t.tok
        FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
        WHERE length(t.tok) > 0
    ),
    tot AS (SELECT tok, COUNT(*) AS ct FROM tok GROUP BY tok),
    vocab AS (SELECT tok, ct FROM tot ORDER BY ct DESC, tok LIMIT {_DRIFT_V}),
    sc AS (
        SELECT tok.source, tok.tok, COUNT(*) AS cs
        FROM tok JOIN vocab ON tok.tok = vocab.tok
        GROUP BY tok.source, tok.tok
    ),
    grid AS (
        SELECT s.source, v.tok, v.ct, COALESCE(sc.cs, 0) AS cs
        FROM (SELECT DISTINCT source FROM documents) s
        CROSS JOIN vocab v
        LEFT JOIN sc ON sc.source = s.source AND sc.tok = v.tok
    ),
    ns AS (SELECT source, SUM(cs) AS nsv FROM grid GROUP BY source),
    nt AS (SELECT SUM(ct) AS ntv FROM vocab)
    SELECT g.source,
           CAST(n.nsv AS BIGINT) AS src_vocab_tokens,
           CAST(SUM(ABS(g.cs * 1000000 // NULLIF(n.nsv, 0)
                 - (g.ct - g.cs) * 1000000 // NULLIF(t.ntv - n.nsv, 0))) AS BIGINT)
               AS drift_ppm_sum
    FROM grid g JOIN ns n ON g.source = n.source CROSS JOIN nt t
    GROUP BY g.source, n.nsv
    """,
)
def corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift diagnostic for corpus curation: for each
    source, total variation of its token-rate vector vs the REST of
    the corpus over the shared top-{_DRIFT_V} vocabulary — the "which
    source is out of distribution" number a crawl-snapshot comparison
    needs. Rates are exact integer parts-per-million (cs·1e6 DIV ns):
    bounded ≤ 1e6 at ANY corpus size, so no overflow and no float — the
    portable DIV arithmetic (== DuckDB //). One token shuffle builds
    counts; vocabulary and the source grid are bounded broadcasts;
    zero-fill comes from the grid so absent tokens still contribute
    their full rest-rate drift."""
    from stream_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok")).filter(
        F.length("tok") > 0
    )
    # ONE token explode pass (r11): aggregate at the finer (tok,
    # source) grain first and re-aggregate for the global counts — the
    # old spelling derived `tok` independently for the vocabulary AND
    # the per-source counts, re-running the full corpus explode+count
    # per consumer (9 documents scans in the frozen plan). The EAGER
    # lineage cut pins the one aggregated pass for both consumers (the
    # frame is aggregate-sized — distinct (tok, source) — never raw
    # tokens; eager because the consumers are parallel subtrees of one
    # job and a lazy pin lets their stages race on the uncached RDD).
    sc0 = (
        tok.groupBy("source", "tok").agg(F.count("*").alias("cs")).localCheckpoint()
    )
    tot = sc0.groupBy("tok").agg(F.sum("cs").alias("ct"))
    vocab = tot.orderBy(F.col("ct").desc(), "tok").limit(_DRIFT_V)
    # broadcast-ok: vocabulary is LIMIT {_DRIFT_V} rows by construction
    sc = sc0.join(F.broadcast(vocab.select("tok")), "tok").select("source", "tok", "cs")  # broadcast-ok: LIMIT-bounded vocabulary
    sources = docs.select("source").distinct().withColumn("_one", F.lit(1))
    # broadcast-ok: vocabulary is LIMIT {_DRIFT_V} rows by construction
    grid = (
        sources.join(F.broadcast(vocab.withColumn("_one", F.lit(1))), "_one")  # broadcast-ok: LIMIT-bounded vocabulary
        .select("source", "tok", "ct")
        .join(sc, ["source", "tok"], "left")
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0)))
    )
    ns = grid.groupBy("source").agg(F.sum("cs").alias("nsv"))
    nt = vocab.agg(F.sum("ct").alias("ntv")).withColumn("_one", F.lit(1))
    # broadcast-ok: global-aggregate scalar, one row by construction
    cells = grid.join(ns, "source").withColumn("_one", F.lit(1)).join(F.broadcast(nt), "_one")
    drift = F.expr(
        "abs(cs * 1000000 DIV nullif(nsv, 0) - (ct - cs) * 1000000 DIV nullif(ntv - nsv, 0))"
    )
    return cells.groupBy("source", "nsv").agg(
        F.sum(drift).cast("bigint").alias("drift_ppm_sum")
    ).select(
        "source", F.col("nsv").cast("bigint").alias("src_vocab_tokens"), "drift_ppm_sum"
    )


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


from stream_spark.queries.dedup_queries import MAX_DOC_FREQ, _SHINGLES3_CAPPED  # noqa: E402


@register(
    "dedup_containment_capped",
    oracle=f"""
    WITH {_SHINGLES3_CAPPED},
    sizes AS (SELECT doc, COUNT(*) AS sz FROM shc GROUP BY doc),
    co AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS common
        FROM shc a JOIN shc b ON a.g = b.g AND a.doc < b.doc
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           common / sa.sz AS containment_ab,
           common / sb.sz AS containment_ba
    FROM co JOIN sizes sa ON doc_a = sa.doc JOIN sizes sb ON doc_b = sb.doc
    WHERE common / sa.sz >= 0.6 OR common / sb.sz >= 0.6
    """,
)
def dedup_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment pairs with the df-cut ON (max_doc_freq={MAX_DOC_FREQ})
    — the crawl-scale default, same bounded-join rationale and SQL-
    replayed HAVING cut as dedup_ngram_jaccard_capped."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.6, max_doc_freq=MAX_DOC_FREQ)


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


_CM_W = 1024  # counter columns per hash row
_CM_H = "CAST(('0x'||substr(md5('cm{i}|'||tok),1,15)) AS BIGINT) % 1024"


@register(
    "corpus_countmin_tokens",
    oracle=f"""
    WITH t AS (
        SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
    ), ex AS (
        SELECT tok, COUNT(*) AS exact_cnt FROM t GROUP BY tok
    ), p AS (
        SELECT tok, exact_cnt,
               {_CM_H.format(i=0)} AS p0, {_CM_H.format(i=1)} AS p1,
               {_CM_H.format(i=2)} AS p2, {_CM_H.format(i=3)} AS p3
        FROM ex
    ),
    c0 AS (SELECT p0, SUM(exact_cnt) AS v0 FROM p GROUP BY p0),
    c1 AS (SELECT p1, SUM(exact_cnt) AS v1 FROM p GROUP BY p1),
    c2 AS (SELECT p2, SUM(exact_cnt) AS v2 FROM p GROUP BY p2),
    c3 AS (SELECT p3, SUM(exact_cnt) AS v3 FROM p GROUP BY p3)
    SELECT tok AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(least(v0, v1, v2, v3) AS BIGINT) AS cm_est
    FROM p JOIN c0 USING (p0) JOIN c1 USING (p1) JOIN c2 USING (p2) JOIN c3 USING (p3)
    """,
)
def corpus_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (d=4 rows × w=1024 counters) over
    corpus tokens, evaluated against exact counts: cm_est ≥ exact
    always, collisions only inflate. The sketch table is FIXED SIZE
    (4×1024 cells) no matter the corpus — the 100 TB path ships
    per-partition partial counters through one bounded shuffle, and
    md5-derived cell positions make the estimate engine-portable
    (same overestimates in the oracle, bit for bit). The exact
    per-token counts here are the evaluation harness, not part of
    the sketch's cost."""
    from stream_spark.operators.text import md5_long, tokens

    docs = load_table(spark, sf_dir, "documents")
    ex = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("exact_cnt"))
    )
    pos = lambda i: (md5_long(F.concat(F.lit(f"cm{i}|"), F.col("tok"))) % _CM_W)  # noqa: E731
    p = ex.select("tok", "exact_cnt", *[pos(i).alias(f"p{i}") for i in range(4)])
    out = p
    for i in range(4):
        ci = p.groupBy(f"p{i}").agg(F.sum("exact_cnt").alias(f"v{i}"))
        # broadcast-ok: counter table bounded by w=1024 cells
        out = out.join(F.broadcast(ci), f"p{i}")
    return out.select(
        F.col("tok").alias("token"),
        "exact_cnt",
        F.least("v0", "v1", "v2", "v3").alias("cm_est"),
    )


from stream_spark.operators.dedup import BAND_SIZE as _BS, PERMS as _PS  # noqa: E402


@register(
    "corpus_cross_source_dup_matrix",
    oracle=f"""
    WITH {{sh}},
    h AS (
        SELECT doc, p, MIN({{mh}}) AS mh
        FROM sh, unnest(generate_series(0, {{perms_m1}})) t(p)
        GROUP BY doc, p
    ),
    bands AS (
        SELECT doc, p // {{bs}} AS band,
               md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY p)) AS bucket
        FROM h GROUP BY doc, p // {{bs}}
    ),
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    )
    SELECT da.source AS source_a, db.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT c.doc_b) AS BIGINT) AS n_dup_docs
    FROM cand c
    JOIN documents da ON c.doc_a = da.doc_id
    JOIN documents db ON c.doc_b = db.doc_id
    GROUP BY source_a, source_b
    """.format(sh=_SHINGLES3, mh=_MH_PERM, perms_m1=_PS - 1, bs=_BS),
)
def corpus_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination diagnostics: for every (source_a,
    source_b) pair, how many near-dup candidate pairs (minhash band
    collisions) straddle them, and how many LATER docs are involved —
    the corpus-curation report that tells you which ingests overlap.
    Built on the same banded index as dedup_minhash_lsh; the two
    source joins are keyed on doc id (dims never broadcast — documents
    is corpus-sized)."""
    from stream_spark.operators.dedup import minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs)
    src = docs.select("doc_id", "source")
    return (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b")), "doc_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("doc_b").alias("n_dup_docs"),
        )
    )


def _bpe_encode_oracle(rounds: int) -> str:
    """Like _bpe_oracle but applies EVERY learned rule (t{rounds}) and
    emits per-doc raw vs encoded token counts."""
    ctes = [
        """t0 AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), tk -> length(tk) > 0) AS toks
        FROM documents
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""p{r} AS (
        SELECT toks[i] AS a, toks[i + 1] AS b, COUNT(*) AS c
        FROM t{r - 1}, unnest(generate_series(1, len(toks) - 1)) s(i)
        GROUP BY 1, 2
    ),
    m{r} AS (SELECT a, b, a || ' ' || b AS mm, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1),
    t{r} AS (
        SELECT doc_id,
               CASE WHEN len(toks) <= 1 THEN toks
                    ELSE list_reduce(list_transform(toks, x -> [x]),
                         (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
                                          THEN list_append(acc[:len(acc) - 1], m.mm)
                                          ELSE list_append(acc, x[1]) END)
               END AS toks
        FROM t{r - 1}, m{r} m
    )""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT t0.doc_id,
           CAST(len(t0.toks) AS BIGINT) AS n_tokens_raw,
           CAST(len(tf.toks) AS BIGINT) AS n_tokens_bpe
    FROM t0 JOIN t{rounds} tf USING (doc_id)"""
    )


@register("corpus_bpe_encode", oracle=_bpe_encode_oracle(_BPE_ROUNDS))
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer train→APPLY pair: induce the merge table exactly
    as corpus_bpe_merges does, then encode the whole corpus with it and
    account the compression per document (raw vs post-merge token
    counts — the number a context-length budget planner needs). Encode
    is rounds× map-only greedy folds; the oracle replays training and
    application for every document."""
    from stream_spark.operators.bpe import bpe_apply_rounds
    from stream_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0).alias("toks")
    )
    raw = toked.select("doc_id", F.size("toks").cast("long").alias("n_tokens_raw"))
    enc = bpe_apply_rounds(toked, rounds=_BPE_ROUNDS).select(
        "doc_id", F.size("toks").cast("long").alias("n_tokens_bpe")
    )
    return raw.join(enc, "doc_id")


#: fixed keyword query for the BM25 retrieval demo (terms chosen from
#: the synthetic vocabulary so every SF matches a non-trivial doc set)
_BM25_TERMS = ("spark", "stream", "window")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "documents_bm25_search",
    oracle=f"""
    WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
    tok AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term FROM n),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
           WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT doc_id,
               CAST(SUM(CAST(floor(
                   ((CAST(2*n_docs - 2*df + 1 AS DOUBLE) / CAST(2*df + 1 AS DOUBLE))
                    * (CAST(22*total_toks*tf AS DOUBLE)
                       / CAST(10*total_toks*tf + 3*total_toks + 9*dl.dl*n_docs AS DOUBLE)))
                   * 1e12) AS BIGINT)) AS BIGINT) AS score_scaled,
               CAST(COUNT(*) AS BIGINT) AS matched_terms
        FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g
        GROUP BY doc_id
    )
    SELECT doc_id, matched_terms, score_scaled,
           CAST(score_scaled AS DOUBLE) / 1e12 AS bm25,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS rank
          FROM scored)
    WHERE rank <= 10
    """,
)
def documents_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval for a fixed keyword query — see
    operators/retrieval.bm25_topk for the exact log-free scoring and
    the scale shape (term-filter-before-shuffle, broadcast stats,
    two-pass top-k)."""
    from stream_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=10)


@register(
    "documents_hybrid_search",
    oracle=f"""
    WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
    tok AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS term FROM n),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
           WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    bscored AS (
        SELECT doc_id,
               CAST(SUM(CAST(floor(
                   ((CAST(2*n_docs - 2*df + 1 AS DOUBLE) / CAST(2*df + 1 AS DOUBLE))
                    * (CAST(22*total_toks*tf AS DOUBLE)
                       / CAST(10*total_toks*tf + 3*total_toks + 9*dl.dl*n_docs AS DOUBLE)))
                   * 1e12) AS BIGINT)) AS BIGINT) AS score_scaled
        FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g
        GROUP BY doc_id
    ),
    sparse AS (SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score_scaled DESC, doc_id) AS r
        FROM bscored) WHERE r <= 50),
    e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
    norms AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
              FROM e GROUP BY vec_id),
    qe AS (SELECT i, x AS qx FROM e WHERE vec_id = 0),
    dots AS (SELECT e.vec_id, CAST(SUM(CAST(e.x * qe.qx AS DECIMAL(28,12))) AS DOUBLE) AS dot
             FROM e JOIN qe USING (i) WHERE e.vec_id <> 0 GROUP BY e.vec_id),
    dsc AS (SELECT d.vec_id, CAST(floor(dot / (na.nrm * qn.nrm) * 1e12) AS BIGINT) AS cs
            FROM dots d JOIN norms na ON d.vec_id = na.vec_id
            JOIN (SELECT nrm FROM norms WHERE vec_id = 0) qn ON TRUE),
    dense AS (SELECT vec_id AS doc_id, r FROM (
        SELECT vec_id, row_number() OVER (ORDER BY cs DESC, vec_id) AS r
        FROM dsc) WHERE r <= 50),
    fused AS (
        SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
               COALESCE(1000000000000 // (60 + s.r), 0)
                 + COALESCE(1000000000000 // (60 + d.r), 0) AS rrf,
               s.r AS sr, d.r AS dr
        FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(rrf AS BIGINT) AS rrf_scaled,
           CAST(COALESCE(sr, 0) AS BIGINT) AS sparse_rank,
           CAST(COALESCE(dr, 0) AS BIGINT) AS dense_rank,
           CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM fused)
    WHERE rank <= 20
    """,
)
def documents_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: BM25 keyword ranking fused with dense
    embedding ranking by Reciprocal Rank Fusion — the standard modern
    corpus-search/eval-mining stack (sparse catches exact keywords,
    dense catches paraphrase; RRF needs no score calibration between
    the two). The dense query is the corpus's own vec 0 (doc_id and
    vec_id are 1:1 in the testdata); both sides take their top 50,
    fused score = Σ 1e12 DIV (60 + rank) over the union (absent side
    contributes 0, surfaced as rank 0), top 20 out.

    Exactness: BM25 is the C54 integer-scaled arithmetic; the dense
    score is the exact-decimal cosine floored at scale 12 to a BIGINT
    (floor on both engines — rule 4), so every rank and the RRF sum
    (integer DIV — rule 8) is engine-identical, ties by id. Scale:
    both rankings are native TakeOrderedAndProject top-k
    (rownum.with_topk_rank — bounded per-partition heaps, no global
    window, no range layout); the fused
    set is <= 100 rows by construction; the dense side here is the
    bruteforce baseline — at 100 TB it swaps to the IVF/PQ probe path
    (C13 family) with fusion unchanged."""
    from stream_spark.operators.retrieval import bm25_topk
    from stream_spark.operators.rownum import with_topk_rank
    from stream_spark.operators.similarity import cosine

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    sparse = bm25_topk(docs, _BM25_TERMS, k=50).select(
        "doc_id", F.col("rank").alias("sparse_rank")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dsc = (
        emb.filter(F.col("vec_id") != 0)
        # broadcast-ok: qv is one row by construction (the query vector)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.floor(cosine(F.col("embedding"), F.col("qv")) * F.lit(1e12))
            .cast("long")
            .alias("cs"),
        )
        .withColumn("neg", -F.col("cs"))
    )
    dense = with_topk_rank(dsc, ["neg", "vec_id"], 50, out="r").select(
        F.col("vec_id").alias("doc_id"), F.col("r").alias("dense_rank")
    )
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.expr("1000000000000 DIV (60 + sparse_rank)"), F.lit(0))
                + F.coalesce(F.expr("1000000000000 DIV (60 + dense_rank)"), F.lit(0))
            ).cast("long").alias("rrf_scaled"),
            F.coalesce("sparse_rank", F.lit(0)).cast("long").alias("sparse_rank"),
            F.coalesce("dense_rank", F.lit(0)).cast("long").alias("dense_rank"),
        )
        .withColumn("neg", -F.col("rrf_scaled"))
    )
    ranked = with_topk_rank(fused, ["neg", "doc_id"], 20, out="rank")
    return ranked.select(
        "doc_id", "rrf_scaled", "sparse_rank", "dense_rank", F.col("rank").cast("long").alias("rank")
    )


@register(
    "corpus_vocab_growth",
    oracle=f"""
    WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
    r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
                 COUNT(*) OVER () AS nd FROM n),
    dec AS (SELECT doc_id, ((rn - 1) * 10) // nd AS decile FROM r),
    tok AS (SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS w FROM n),
    fs AS (SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w),
    per AS (SELECT d.decile, CAST(COUNT(*) AS BIGINT) AS new_types
            FROM fs JOIN dec d ON fs.first_doc = d.doc_id GROUP BY d.decile),
    grid AS (SELECT i AS decile FROM unnest(generate_series(0, 9)) t(i)),
    filled AS (SELECT g.decile, COALESCE(p.new_types, 0) AS new_types
               FROM grid g LEFT JOIN per p ON g.decile = p.decile)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
    FROM filled
    """,
)
def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve — the token-level corpus
    saturation diagnostic (companion to documents_ngram_novelty):
    ingesting docs in doc_id order, how many NEW distinct tokens does
    each corpus decile contribute, and what is the cumulative
    vocabulary size? A flattening curve says another crawl dump buys
    few new types.

    Scale: token first-seen is MIN over the token key (order-free, one
    aggregate); doc→decile uses the two-pass rownum (no global-ordered
    window); the per-decile rollup and the 10-row cumulative grid are
    bounded metadata — the only ordered prefix sum runs over TEN rows.
    """
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import normalize_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(normalize_text(F.col("text"))).alias("ws"))
    r = with_global_row_number(base.select("doc_id"), ["doc_id"], out="rn")
    # bounded-metadata collect: ONE number off the rownum checkpoint
    # (same class as the rownum partition counts) — keeps the audited
    # plan free of any single-partition aggregate
    nd = r.count()
    dec = r.select(
        "doc_id", F.expr(f"((rn - 1) * 10) DIV {nd}").cast("long").alias("decile")
    )
    fs = (
        base.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per = (
        fs.join(dec, fs.first_doc == dec.doc_id)
        .groupBy("decile")
        .agg(F.count("*").cast("long").alias("new_types"))
    )
    grid = spark.range(10).select(F.col("id").cast("long").alias("decile"))
    # broadcast-ok: per is <= 10 rows by construction (decile rollup)
    filled = grid.join(F.broadcast(per), "decile", "left").select(
        "decile", F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types")
    )
    # the cumulative sum fans each decile onto itself and all later
    # deciles (bounded 10x10 grid) — no ordered window at all
    contrib = filled.select(
        F.col("new_types").alias("c"),
        F.explode(F.sequence(F.col("decile"), F.lit(9))).alias("t_decile"),
    )
    cum = contrib.groupBy("t_decile").agg(F.sum("c").cast("long").alias("vocab_size"))
    return (
        filled.join(cum, filled.decile == cum.t_decile)
        .select("decile", "new_types", "vocab_size")
    )


@register(
    "documents_source_keywords",
    oracle="""
    WITH n AS (SELECT source, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
               FROM documents),
    tok AS (SELECT source, unnest(string_split_regex(norm, '\\s+')) AS w FROM n),
    sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY source, w),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ts FROM sw GROUP BY source),
    tw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM sw GROUP BY w),
    tot AS (SELECT CAST(SUM(ts) AS BIGINT) AS t FROM st),
    rates AS (
        SELECT sw.source, sw.w,
               CAST(sw.c * 1000000 // st.ts AS BIGINT) AS rate_ppm,
               CAST((tw.cw - sw.c) * 1000000 // (tot.t - st.ts) AS BIGINT) AS rest_ppm
        FROM sw JOIN st USING (source) JOIN tw USING (w) CROSS JOIN tot
    ),
    ranked AS (
        SELECT source, w AS term, rate_ppm, rest_ppm, rate_ppm - rest_ppm AS lift,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY rate_ppm - rest_ppm DESC, w
               ) AS BIGINT) AS rnk
        FROM rates
    )
    SELECT source, term, rate_ppm, rest_ppm, lift, rnk FROM ranked WHERE rnk <= 10
    """,
)
def documents_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive-keyword profile — the "what is this
    source made of" inspection every mixture decision leans on: for
    each source, the top-10 tokens by exact integer ppm LIFT
    (in-source rate minus rest-of-corpus rate, both `cnt·1e6 DIV
    total` — no libm log-odds, same DIV spelling both engines).

    Scale: token counts are keyed aggregates; the per-source totals ×
    corpus total live in a ≤|sources|-row eagerly-checkpointed table
    (no scalar-subquery re-expansion); the per-token rest-rate needs
    one vocab-keyed join (AQE skew-safe). The top-10 rank is SALTED
    two-stage: stage 1 takes the top-10 per (source, md5-salt-of-term
    % 64) — 64-way parallel, no window ever sees a full vocabulary —
    stage 2 ranks the ≤640 survivors per source. Exact: the global
    top-10 under the total order (lift desc, term) is contained in the
    union of per-salt top-10s, so the refinement drops only rows that
    could never rank ≤10."""
    from stream_spark.operators.text import md5_long, normalize_text, tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(normalize_text(F.col("text")))).alias("w")
    )
    sw = tok.groupBy("source", "w").agg(F.count("*").cast("long").alias("c"))
    st = sw.groupBy("source").agg(F.sum("c").cast("long").alias("ts"))
    tw = sw.groupBy("w").agg(F.sum("c").cast("long").alias("cw"))
    tot = st.agg(F.sum("ts").cast("long").alias("t"))
    # ≤|sources| rows by construction — checkpoint so the global total
    # never re-expands as a scalar subquery per downstream reference
    srcden = (
        st.crossJoin(F.broadcast(tot))  # broadcast-ok: 1-row corpus total
        .select("source", "ts", (F.col("t") - F.col("ts")).alias("rest_total"))
        .localCheckpoint(eager=True)
    )
    rates = (
        sw.join(tw, "w")
        .join(F.broadcast(srcden), "source")  # broadcast-ok: one row per source
        .select(
            "source",
            F.col("w").alias("term"),
            F.expr("c * 1000000 DIV ts").cast("long").alias("rate_ppm"),
            F.expr("(cw - c) * 1000000 DIV rest_total").cast("long").alias("rest_ppm"),
        )
        .withColumn("lift", F.col("rate_ppm") - F.col("rest_ppm"))
    )
    salted = Window.partitionBy(
        "source", F.pmod(md5_long(F.col("term")), F.lit(64))
    ).orderBy(F.desc("lift"), F.asc("term"))
    survivors = rates.withColumn("srnk", F.row_number().over(salted)).filter(
        F.col("srnk") <= 10
    )
    final = Window.partitionBy("source").orderBy(F.desc("lift"), F.asc("term"))
    return (
        survivors.withColumn("rnk", F.row_number().over(final).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("source", "term", "rate_ppm", "rest_ppm", "lift", "rnk")
    )


@register(
    "documents_temperature_sample",
    oracle="""
    WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
                 FROM documents GROUP BY source),
    h AS (SELECT doc_id, source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 1048576 AS hv
          FROM documents)
    SELECT h.doc_id, h.source
    FROM h JOIN cnt USING (source)
    WHERE CAST(hv AS HUGEINT) * hv * n_s
          < CAST(2097152 AS HUGEINT) * 2097152
    """,
)
def documents_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture sampling (the UNIMAX / mT5
    multilingual rebalance, α = 0.5): per-source keep probability
    ∝ 1/√n_source, so over-represented sources are downsampled toward
    a flatter mixture while small sources keep everything. The √ never
    appears: keep iff ``h² · n_s < C²`` with h = md5(doc_id) mod 2^20
    and C = 2^21 — squaring both sides of ``h < C/√n_s`` keeps every
    comparison EXACT (Spark DECIMAL(38,0) / DuckDB HUGEINT — no float,
    no isqrt ulp hazard, valid to ~10^24·n_s before precision runs
    out, i.e. any corpus). Deterministic and reproducible: membership
    depends only on doc_id and the source's total count.

    Scale: one keyed per-source count (bounded dimension, broadcast
    back), then a pure map-side filter — no corpus shuffle."""
    from stream_spark.operators.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_s"))
    m, c = 1 << 20, 1 << 21
    return (
        docs.join(F.broadcast(counts), "source")  # broadcast-ok: one row per source
        .withColumn("hv", F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(m)))
        .filter(
            F.col("hv").cast("decimal(38,0)") * F.col("hv") * F.col("n_s") < F.lit(c * c)
        )
        .select("doc_id", "source")
    )


@register(
    "documents_shard_assignment",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                          AS n_tokens
               FROM documents),
    r AS (SELECT doc_id, n_tokens,
                 CAST(row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS rn
          FROM t)
    SELECT doc_id, n_tokens,
           CAST(CASE WHEN ((rn - 1) // 8) % 2 = 0
                     THEN (rn - 1) % 8
                     ELSE 7 - ((rn - 1) % 8) END AS BIGINT) AS shard
    FROM r
    """,
)
def documents_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced shard assignment for N=8 trainer ranks —
    the data-parallel "who reads what" table: docs ranked by token
    count (desc, doc_id tie-break) then dealt in a SNAKE/boustrophedon
    pattern (round r deals left-to-right when even, right-to-left when
    odd), the classic LPT-style folding that bounds per-shard token
    imbalance by one document per round without any sequential greedy
    state.

    Scale: the global rank is the two-pass partition-offset rownum
    primitive (range exchange + bounded offsets collect — never a
    single-partition sort); the snake arithmetic is a map-side CASE.
    Assignment depends only on the corpus content, so every rank can
    recompute its own file list independently."""
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    ).withColumn("_neg", -F.col("n_tokens"))
    r = with_global_row_number(t, ["_neg", "doc_id"])
    return r.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "CAST(CASE WHEN ((rn - 1) DIV 8) % 2 = 0 THEN (rn - 1) % 8"
            " ELSE 7 - ((rn - 1) % 8) END AS BIGINT)"
        ).alias("shard"),
    )


@register(
    "documents_curriculum_order",
    oracle="""
    WITH h AS (SELECT doc_id, source,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                          AS hkey
               FROM documents),
    r AS (SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id)
                      AS BIGINT) AS rs
          FROM h),
    s AS (SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sr
          FROM (SELECT DISTINCT source FROM documents)),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM s)
    SELECT r.doc_id, r.source,
           CAST((r.rs - 1) * n.ns + s.sr AS BIGINT) AS global_pos
    FROM r JOIN s USING (source) CROSS JOIN n
    """,
)
def documents_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order — the "no
    source streaks" data ordering a stable training run wants: docs
    are hash-shuffled WITHIN each source (md5 of doc_id — reproducible,
    seedless) and sources are dealt round-robin, so any contiguous
    window of the resulting order has near-proportional source mix.
    global_pos = (rank_within_source - 1)·n_sources + source_rank is a
    total order (gaps appear once smaller sources exhaust — it is an
    ORDERING key, not a contiguous index).

    Scale: within-source rank rides the two-pass global rownum over
    (source, hash) — one range exchange, NO per-source window over a
    full partition and no single-partition sort; the per-source offset
    table and the source-rank table are bounded (≤|sources| rows,
    driver-built from a bounded-metadata collect)."""
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import md5_long

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source").withColumn(
        "hkey", md5_long(F.col("doc_id").cast("string"))
    )
    r = with_global_row_number(t, ["source", "hkey", "doc_id"])
    offs = r.groupBy("source").agg(F.min("rn").alias("off"))
    # bounded-metadata collect: the distinct source list (mixture
    # dimension, ≤|sources| rows by construction)
    srcs = sorted(x["source"] for x in docs.select("source").distinct().collect())
    sr_df = spark.createDataFrame(
        [(s, i + 1) for i, s in enumerate(srcs)], "source string, sr long"
    )
    return (
        r.join(F.broadcast(offs), "source")  # broadcast-ok: one row per source
        .join(F.broadcast(sr_df), "source")  # broadcast-ok: one row per source
        .select(
            "doc_id",
            "source",
            ((F.col("rn") - F.col("off")) * len(srcs) + F.col("sr"))
            .cast("long")
            .alias("global_pos"),
        )
    )
