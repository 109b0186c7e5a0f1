"""Text-analysis queries (SURVEY §2 C8–C11) over ``documents``.

Shared SQL fragments mirror the Spark operators exactly — note
DuckDB's regexp_replace needs the 'g' flag to match Spark's
replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_spark.operators.rownum import cpu_partitions

from stream_spark.operators.text import (
    STOPWORDS,
    QUALITY_STOPWORDS,
    fingerprint,
    langid,
    quality_features,
    repetition_features,
    decontaminate,
    bpe_ish_token_count,
    line_chunks,
    token_count,
    tokens,
)
from stream_spark.operators.packing import pack_sequences
from stream_spark.queries.registry import register
from stream_spark.sources import load_table

TOKS = "string_split_regex(trim(text), '\\s+')"
NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
MD5_60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


_STOP_IN = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

@register(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               CAST(len({TOKS}) AS BIGINT) AS n_tokens,
               CAST(len(list_filter({TOKS}, w -> w IN ({_STOP_IN}))) AS BIGINT) AS n_stopwords,
               length(text) AS n_char,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS n_punct
        FROM documents
    )
    SELECT doc_id, n_tokens, n_stopwords,
           n_stopwords / n_tokens AS stopword_ratio,
           n_digit / n_char AS digit_ratio,
           n_punct / n_char AS punct_ratio,
           (n_char - (n_tokens - 1)) / n_tokens AS mean_token_len,
           (CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 0.4 ELSE 0.0 END
            + CASE WHEN n_stopwords / n_tokens >= 0.05 THEN 0.3 ELSE 0.0 END
            + CASE WHEN n_digit / n_char <= 0.2 THEN 0.2 ELSE 0.0 END
            + CASE WHEN n_punct / n_char <= 0.1 THEN 0.1 ELSE 0.0 END) AS quality_score
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return quality_features(docs).select(
        "doc_id",
        F.col("n_tokens").cast("long"),
        F.col("n_stopwords").cast("long"),
        "stopword_ratio",
        "digit_ratio",
        "punct_ratio",
        "mean_token_len",
        "quality_score",
    )


def _langid_oracle() -> str:
    hit_cols = ",\n               ".join(
        f"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"w -> w IN ({', '.join(repr(w) for w in words)}))) AS BIGINT) AS hits_{lang}"
        for lang, words in STOPWORDS.items()
    )
    pred = "'unknown'"
    hits = "0"
    for lang in STOPWORDS:  # same fixed order + strict > as the operator
        pred = f"CASE WHEN hits_{lang} > ({hits}) THEN '{lang}' ELSE ({pred}) END"
        hits = f"CASE WHEN hits_{lang} > ({hits}) THEN hits_{lang} ELSE ({hits}) END"
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {hit_cols}
        FROM documents
    )
    SELECT doc_id, lang, {', '.join('hits_' + l for l in STOPWORDS)},
           {pred} AS predicted_lang
    FROM scored
    """


@register("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = langid(docs)
    return out.select(
        "doc_id",
        "lang",
        *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}") for lang in STOPWORDS],
        "predicted_lang",
    )


def _langid_confusion_oracle() -> str:
    hit_cols = ",\n               ".join(
        f"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"w -> w IN ({', '.join(repr(w) for w in words)}))) AS BIGINT) AS hits_{lang}"
        for lang, words in STOPWORDS.items()
    )
    pred = "'unknown'"
    hits = "0"
    for lang in STOPWORDS:  # same fixed order + strict > as the operator
        pred = f"CASE WHEN hits_{lang} > ({hits}) THEN '{lang}' ELSE ({pred}) END"
        hits = f"CASE WHEN hits_{lang} > ({hits}) THEN hits_{lang} ELSE ({hits}) END"
    return f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {hit_cols}
        FROM documents
    ),
    p AS (SELECT lang AS true_lang, {pred} AS predicted_lang FROM scored),
    cm AS (SELECT true_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM p GROUP BY true_lang, predicted_lang),
    tot AS (SELECT true_lang, SUM(n_docs) AS t FROM cm GROUP BY true_lang)
    SELECT cm.true_lang, cm.predicted_lang, cm.n_docs,
           CAST((cm.n_docs * 1000000) // t.t AS BIGINT) AS share_ppm
    FROM cm JOIN tot t USING (true_lang)
    """


@register("documents_langid_confusion", oracle=_langid_confusion_oracle())
def documents_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (r9): per (true, predicted) doc
    counts and the row-normalized share in exact ppm — the eval every
    curation pipeline runs before trusting a language gate (how much
    of each language would a keep-list drop, and where do the errors
    go). Prediction is the same single-expression stopword-hit
    heuristic the langid gate uses, so the matrix audits the EXACT
    operator that filters the corpus.

    Scale: one map-side prediction expression, one keyed (true, pred)
    aggregate (≤ |langs|² rows), totals joined back on the aggregated
    matrix — no window over raw docs, nothing driver-side."""
    from stream_spark.operators.text import langid_pred

    docs = load_table(spark, sf_dir, "documents")
    cm = (
        docs.select(
            F.col("lang").alias("true_lang"),
            langid_pred(F.col("text")).alias("predicted_lang"),
        )
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = cm.groupBy("true_lang").agg(F.sum("n_docs").alias("t"))
    return (
        # broadcast-ok: tot is one row per TRUE language (bounded class set)
        cm.join(F.broadcast(tot), "true_lang")
        .withColumn("share_ppm", F.expr("(n_docs * 1000000) DIV t").cast("long"))
        .select("true_lang", "predicted_lang", "n_docs", "share_ppm")
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
    toks AS (SELECT doc_id, string_split_regex(norm, '\\s+') AS ws FROM n),
    g5 AS (
        SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS g
        FROM toks, unnest(generate_series(1, len(ws) - 4)) t(i)
    ),
    mins AS (SELECT doc_id, MIN({MD5_60.format(x='g')}) AS fp_min_shingle FROM g5 GROUP BY doc_id)
    SELECT n.doc_id, {MD5_60.format(x='norm')} AS fp_md5, mins.fp_min_shingle
    FROM n LEFT JOIN mins ON n.doc_id = mins.doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fp_md5", "fp_min_shingle")


@register(
    "text_repetition_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    b AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
          FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM b GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS dup_ngram_frac,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS top_ngram_frac
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (duplicate-bigram and
    top-bigram fractions) per document."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_features(docs, n=2)


@register(
    "text_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    g AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+3], ' ') AS gram
          FROM t, unnest(generate_series(1, len(toks) - 3)) AS u(i)),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 50 <> 0
    GROUP BY g.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 4-gram
    with the 'benchmark suite' (every 50th doc stands in for an eval
    set); returns doc_id + distinct shared-gram count."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate(corpus, bench, n=4)


@register(
    "documents_line_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    chunks AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(list_slice(t, (i - 1) * 10 + 1, i * 10), ' ') AS line
        FROM toks, unnest(generate_series(1, (len(t) + 9) // 10)) u(i)
    ),
    freq AS (SELECT line, COUNT(*) AS c FROM chunks GROUP BY line),
    j AS (SELECT ch.doc_id, ch.pos, ch.line, f.c
          FROM chunks ch JOIN freq f USING (line))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           md5(COALESCE(string_agg(CASE WHEN c < 3 THEN line END, ' ' ORDER BY pos), ''))
               AS retained_md5
    FROM j GROUP BY doc_id
    """,
)
def documents_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level LINE dedup (Raffel et al. 2020 §2.2:
    drop any line occurring ≥3 times in the corpus), over deterministic
    10-token chunk "lines" (text.line_chunks — the corpus has no
    newline structure). Per doc: chunk count, dropped-chunk count, and
    the md5 of the order-preserved retained text — the verifiable form
    of the rewritten document.

    Scale: chunk fan-out is n_tokens/10 rows (one map-side explode,
    pre-repartitioned by doc); the line-frequency table is corpus-scale
    so it is expressed as an equi-JOIN on line with NO broadcast hint —
    size-based planning keeps it a shuffle join at crawl scale (AQE
    skew-splittable — a hot boilerplate line is exactly the skew case)
    and may legitimately broadcast it only when measured small; the
    per-doc rebuild is one keyed aggregate. Reference scope: the flogo
    engine has no corpus-level text operators — this extends SURVEY §2
    block C (training-data pipeline), same family as C33 boilerplate.
    """
    from stream_spark.operators.dedup import _materialize_index

    docs = load_table(spark, sf_dir, "documents")
    par = cpu_partitions(docs)
    chunked = (
        docs.repartition(par, "doc_id")
        .select(
            "doc_id",
            F.posexplode(line_chunks(tokens(F.col("text")), 10)).alias("pos", "line"),
        )
    )
    # the chunk table feeds the frequency aggregate AND the join back —
    # materialize the explode once (r9 _materialize_index pattern)
    chunked = _materialize_index(chunked)
    freq = chunked.groupBy("line").agg(F.count("*").alias("c"))
    j = chunked.join(freq, "line")
    kept = F.array_sort(
        F.collect_list(F.when(F.col("c") < 3, F.struct("pos", "line")))
    )
    return j.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("c") >= 3, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.md5(F.concat_ws(" ", F.transform(kept, lambda s: s["line"]))).alias("retained_md5"),
    )


@register(
    "training_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS s,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(s AS BIGINT) AS start_offset,
           CAST(s // 2048 AS BIGINT) AS pack_id,
           CAST((cum - 1) // 2048 - s // 2048 + 1 AS BIGINT) AS n_packs_spanned
    FROM c
    """,
)
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: whitespace token counts,
    docs concatenated in doc_id order, chunked into 2048-token
    contexts. The global prefix sum is the two-pass partition-offset
    primitive — no single-partition window at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
    return pack_sequences(with_tokens, budget=2048)


_MIX = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
_MIX_N = 60
_MIX_VALUES = ", ".join(f"('{s}', CAST({sh} AS DOUBLE))" for s, sh in _MIX.items())


@register(
    "corpus_mix_sources",
    oracle=f"""
    WITH tgt(source, share) AS (VALUES {_MIX_VALUES}),
    cnt AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
    rates AS (
        SELECT t.source,
               CAST(floor(10000 * LEAST(CAST(1.0 AS DOUBLE), {_MIX_N} * t.share / c.c)) AS BIGINT) AS thr
        FROM tgt t JOIN cnt c ON c.source = t.source
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < r.thr
    """,
)
def corpus_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing toward target source proportions
    (40/30/20/10 over four sources, 60-doc budget) — the decision is a
    pure function of doc_id, so the mix is identical on any cluster
    layout."""
    from stream_spark.operators.sampling import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    return mix_corpus(docs, "doc_id", "source", _MIX, _MIX_N).select("doc_id", "source")


@register(
    "documents_train_val_test",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def documents_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 split: contiguous hash-bucket ranges —
    membership depends only on doc_id, never on layout or history."""
    from stream_spark.operators.sampling import split_corpus

    docs = load_table(spark, sf_dir, "documents")
    return split_corpus(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).select(
        "doc_id", "split"
    )


@register(
    "text_oov_rate",
    oracle=f"""
    WITH doc_words AS (
        SELECT doc_id, unnest({TOKS}) AS t FROM documents
    ),
    freq AS (SELECT t AS w, COUNT(*) AS c FROM doc_words GROUP BY t),
    vocab AS (SELECT w FROM freq ORDER BY c DESC, w LIMIT 50),
    oov AS (
        SELECT dw.doc_id, COUNT(*) AS n_oov
        FROM doc_words dw LEFT JOIN vocab v ON dw.t = v.w
        WHERE v.w IS NULL GROUP BY dw.doc_id
    ),
    per_doc AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM documents)
    SELECT p.doc_id, p.n_tokens,
           CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
           CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / p.n_tokens AS oov_rate
    FROM per_doc p LEFT JOIN oov o ON p.doc_id = o.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate against the corpus top-50 vocabulary
    (ties broken by count DESC, word ASC — deterministic). The vocab
    is a bounded-metadata collect (K rows) compiled into the scoring
    expression — per-doc scoring is a map-only pass, no join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    words = docs.select(F.explode(toks).alias("w"))
    top = (
        words.groupBy("w").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(50)
        .collect()  # bounded metadata: K vocabulary rows
    )
    vocab = [r["w"] for r in top]
    n_tok = F.size(toks)
    n_oov = F.size(F.filter(toks, lambda t: ~t.isin(*vocab)))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        (n_oov.cast("double") / n_tok).alias("oov_rate"),
    )


@register(
    "documents_gopher_rules",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS ws FROM documents),
    feat AS (
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_words,
               list_aggregate(list_transform(ws, w -> length(w)), 'sum') / len(ws) AS mean_word_len,
               len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) / len(ws) AS alpha_frac,
               CAST(len(list_filter(ws, w -> w IN ({_STOP_IN}))) AS BIGINT) AS n_stop_hits
        FROM t
    ), rules AS (
        SELECT *,
               CAST(CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS rule_n_words,
               CAST(CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0 THEN 1 ELSE 0 END AS BIGINT) AS rule_mean_len,
               CAST(CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS rule_alpha,
               CAST(CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS rule_stopwords
        FROM feat
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop_hits,
           rule_n_words, rule_mean_len, rule_alpha, rule_stopwords,
           CAST(CASE WHEN rule_n_words = 1 AND rule_mean_len = 1 AND rule_alpha = 1
                     AND rule_stopwords = 1 THEN 1 ELSE 0 END AS BIGINT) AS gopher_keep
    FROM rules
    """,
)
def documents_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality gate (operators/text.gopher_rules): per-rule 0/1
    flags + conjunction, so rejection rates per rule are one groupBy
    away."""
    from stream_spark.operators.text import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    return gopher_rules(docs).select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stop_hits",
        "rule_n_words", "rule_mean_len", "rule_alpha", "rule_stopwords", "gopher_keep",
    )


@register(
    "documents_boilerplate_share",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {TOKS} AS ws FROM documents),
    grams AS (
        SELECT DISTINCT doc_id, source,
               {MD5_60.format(x="ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")} AS gk
        FROM t, unnest(generate_series(1, len(ws) - 2)) s(i)
    ),
    dfreq AS (SELECT source, gk, COUNT(*) AS gdf FROM grams GROUP BY source, gk),
    sizes AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    hot AS (
        SELECT d.source, d.gk FROM dfreq d JOIN sizes s ON d.source = s.source
        WHERE d.gdf >= 2 AND d.gdf * 1.0 / s.n_docs >= 0.5
    ),
    per_doc AS (SELECT doc_id, source, COUNT(*) AS n_grams FROM grams GROUP BY doc_id, source),
    hotdoc AS (
        SELECT g.doc_id, COUNT(*) AS n_hot
        FROM grams g JOIN hot h ON g.source = h.source AND g.gk = h.gk
        GROUP BY g.doc_id
    )
    SELECT p.doc_id, p.source, p.n_grams,
           COALESCE(h.n_hot, 0) AS n_hot,
           COALESCE(h.n_hot, 0) / p.n_grams AS boilerplate_share
    FROM per_doc p LEFT JOIN hotdoc h ON p.doc_id = h.doc_id
    """,
)
def documents_boilerplate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source frequent-n-gram boilerplate score
    (operators/text.boilerplate_share): the share of a doc's distinct
    3-grams appearing in ≥50% of its source's documents."""
    from stream_spark.operators.text import boilerplate_share

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_share(docs)


@register(
    "documents_quality_ntile",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               (CASE WHEN len({TOKS}) >= 10 AND len({TOKS}) <= 1000 THEN 0.4 ELSE 0.0 END
                + CASE WHEN len(list_filter({TOKS}, w -> w IN ({_STOP_IN}))) * 1.0 / len({TOKS}) >= 0.05 THEN 0.3 ELSE 0.0 END
                + CASE WHEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) <= 0.2 THEN 0.2 ELSE 0.0 END
                + CASE WHEN length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) * 1.0 / length(text) <= 0.1 THEN 0.1 ELSE 0.0 END
               ) AS quality_score
        FROM documents
    ),
    r AS (
        SELECT doc_id, quality_score,
               row_number() OVER (ORDER BY quality_score DESC, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM feat
    )
    SELECT doc_id, quality_score,
           CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS curriculum_bucket
    FROM r
    """,
)
def documents_quality_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: decile-rank documents by quality score
    (best = bucket 1) with a deterministic (score DESC, doc_id)
    tie-break — the shard assignment a staged training run reads in
    order. The global rank comes from the two-pass partition-offset
    primitive (operators/rownum — no single-partition sort, per the
    repo's own scale rule), and the bucket is the explicit
    floor((rn-1)·k/n) formula, spelled identically in both engines
    (SQL ntile distributes remainders differently). At 100 TB, swap
    the exact rank for sampled quantile cuts of the score
    (sketches.sampled_quantiles) — same output columns."""
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import quality_features

    docs = load_table(spark, sf_dir, "documents")
    feat = quality_features(docs).select(
        "doc_id", "quality_score", (-F.col("quality_score")).alias("_neg")
    )
    ranked = with_global_row_number(feat, ["_neg", "doc_id"]).drop("_neg")
    n = ranked.count()  # bounded metadata: one scalar
    return ranked.select(
        "doc_id",
        "quality_score",
        (F.expr(f"((rn - 1) * 10) DIV {n}") + 1).cast("long").alias("curriculum_bucket"),
    )


@register(
    "training_pack_efficiency",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS s,
               SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    ),
    packed AS (
        SELECT doc_id, n_tokens, CAST(s // 2048 AS BIGINT) AS pack_id,
               CAST((cum - 1) // 2048 - s // 2048 + 1 AS BIGINT) AS n_packs_spanned
        FROM c
    )
    SELECT pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs_starting,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
           CAST(SUM(CASE WHEN n_packs_spanned > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
    FROM packed GROUP BY pack_id
    """,
)
def training_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing diagnostics over the pack_sequences output: per 2048-
    token context, how many docs START in it, how many tokens they
    contribute, and how many straddle the boundary (candidates for
    splitting or re-packing). Concat-then-chunk wastes zero tokens by
    construction — boundary fragmentation is the metric that matters.
    One keyed agg on the packed frame; inherits the two-pass prefix-sum
    scale shape."""
    docs = load_table(spark, sf_dir, "documents")
    with_tokens = docs.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))
    packed = pack_sequences(with_tokens, budget=2048)
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs_starting"),
        F.sum("n_tokens").alias("tokens_started"),
        F.sum(F.when(F.col("n_packs_spanned") > 1, 1).otherwise(0)).cast("long").alias("n_boundary_docs"),
    )


@register(
    "documents_lm_quality_buckets",
    oracle=f"""
    WITH n AS (SELECT doc_id, {{NORM}} AS norm FROM documents),
    toks AS (SELECT doc_id, string_split_regex(norm, '\\s+') AS ws FROM n),
    bg AS (
        SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS g
        FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
    ),
    uni AS (
        SELECT tok AS w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(ws) AS tok FROM toks) GROUP BY tok
    ),
    bgc AS (SELECT g, MIN(w1) AS w1, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY g),
    ppm AS (SELECT g, CAST(((c12 + 1) * 1000000)
                           // (c1 + (SELECT COUNT(*) FROM uni)) AS BIGINT) AS ppm
            FROM bgc JOIN uni USING (w1)),
    scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(CAST(SUM(ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_ppm
        FROM bg JOIN ppm USING (g) GROUP BY doc_id
    ),
    ranked AS (SELECT *, row_number() OVER (ORDER BY mean_ppm DESC, doc_id) AS rn,
                      COUNT(*) OVER () AS n_docs FROM scored)
    SELECT doc_id, n_bigrams, mean_ppm,
           CAST(((rn - 1) * 3) // n_docs AS BIGINT) AS bucket,
           CASE ((rn - 1) * 3) // n_docs
               WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail' END AS lm_bucket
    FROM ranked
    """.replace("{NORM}", NORM),
)
def documents_lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020): score each
    document by corpus bigram-LM fluency and bucket into head/middle/
    tail terciles — the curriculum/filter split a crawl curation
    pipeline cuts on.

    Fluency surrogate with NO libm risk: per-bigram Laplace-smoothed
    conditional probability as exact integer ppm —
    ``(count(w1 w2)+1)·1e6 DIV (count(w1)+V)`` with V the unigram
    vocabulary size (unsmoothed MLE scores singleton contexts p=1,
    inverting the fluency signal) — and per-doc score = integer mean
    of its bigram ppms
    (arithmetic-mean-of-probabilities rather than perplexity's
    geometric mean: same monotone direction — higher = more fluent —
    with every step exact BIGINT arithmetic, oracle rules 1/8).
    Terciles by the portable ``floor((rn-1)·3/n)`` rank formula, rank
    via the two-pass partition-offset rownum (no single-partition
    sort); the corpus bigram/unigram stat tables are vocab-bounded and
    the doc-bigram→stats join is keyed (AQE skew-join handles hot
    common bigrams) — linear at crawl scale.
    """
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens(normalize_text(F.col("text"))).alias("ws")
    )
    idx = F.sequence(F.lit(1), F.size("ws") - 1)
    bg = (
        toked.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(F.col("ws"), i.cast("int")).alias("w1"),
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("ws"), i.cast("int")),
                            F.element_at(F.col("ws"), (i + 1).cast("int")),
                        ).alias("g"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.g").alias("g"))
    )
    uni = (
        toked.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    bgc = bg.groupBy("g").agg(
        F.min("w1").alias("w1"), F.count("*").cast("long").alias("c12")
    )
    # vocab is the 1-row vocabulary size for the Laplace denominator
    # (hidden behind the rownum checkpoint, so the audited final plan
    # keeps its single sanctioned SinglePartition exchange)
    vocab = uni.agg(F.count("*").cast("long").alias("v"))
    ppm = (
        bgc.join(uni, "w1")
        # broadcast-ok: vocab is one row by construction (global count)
        .crossJoin(F.broadcast(vocab))
        .select("g", F.expr("((c12 + 1) * 1000000) DIV (c1 + v)").cast("long").alias("ppm"))
    )
    scored = (
        bg.join(ppm, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("ppm").cast("long").alias("sum_ppm"),
        )
        .withColumn("mean_ppm", F.expr("sum_ppm DIV n_bigrams").cast("long"))
        .withColumn("neg_ppm", -F.col("mean_ppm"))
    )
    ranked = with_global_row_number(scored, ["neg_ppm", "doc_id"], out="rn")
    # n_docs is the 1-row global scored-doc count (the sanctioned
    # single-partition aggregate); counted AFTER the rownum pass so it
    # scans the rownum localCheckpoint instead of recomputing the
    # bigram pipeline
    n_docs = ranked.agg(F.count("*").cast("long").alias("n_docs"))
    # broadcast-ok: n_docs is one row by construction (global count)
    ranked = ranked.crossJoin(F.broadcast(n_docs))
    bucket = F.expr("((rn - 1) * 3) DIV n_docs").cast("long")
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "mean_ppm",
        bucket.alias("bucket"),
        F.when(bucket == 0, F.lit("head"))
        .when(bucket == 1, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("lm_bucket"),
    )


@register(
    "documents_dsir_selection",
    oracle=f"""
    WITH n AS (SELECT doc_id, lang, {NORM} AS norm FROM documents),
    toks AS (SELECT doc_id, lang, string_split_regex(norm, '\\s+') AS ws FROM n),
    bg AS (
        SELECT doc_id, lang,
               {MD5_60.format(x="ws[i] || ' ' || ws[i+1]")} % 1024 AS b
        FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS r_total,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS t_total
            FROM bg),
    bu AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb,
                  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tb
           FROM bg GROUP BY b),
    w AS (SELECT b,
                 least((((tb + 1) * 10000000000 // (t_total + 1024)) * 1000000)
                        // ((rb + 1) * 10000000000 // (r_total + 1024)),
                       1000000000) AS wgt
          FROM bu, tot),
    db AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY doc_id, b),
    scored AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                      CAST(CAST(SUM(c * wgt) AS BIGINT) // CAST(SUM(c) AS BIGINT) AS BIGINT)
                          AS dsir_score
               FROM db JOIN w USING (b) GROUP BY doc_id),
    ranked AS (SELECT *, row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rn,
                      COUNT(*) OVER () AS nd FROM scored)
    SELECT doc_id, n_bigrams, dsir_score,
           CAST(((rn - 1) * 4) // nd AS BIGINT) AS quartile
    FROM ranked
    """,
)
def documents_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via hashed-n-gram importance weights
    (Xie et al. 2023): score every raw document by how much its hashed
    bigram distribution resembles a TARGET domain (here lang='en'
    docs), then bucket the corpus into selection quartiles (quartile 0
    = the kept resample head).

    Exact-integer analogue of the importance weight, same discipline as
    the BM25/CCNet treatments (no libm): bigrams feature-hash into
    B=1024 buckets via md5_long mod B; Laplace bucket probabilities as
    scale-1e10 integers ``(t_b+1)·1e10 DIV (T+B)``; the per-bucket
    importance ratio is the micro-scaled quotient of the two, CLIPPED
    at 1000× (``least(·,1e9)``) — importance-weight clipping is the
    standard DSIR variance control, and here it also bounds the per-doc
    sum at n_bigrams·1e9, overflow-free for million-bigram docs. The
    per-doc score is the arithmetic mean of its bigrams' clipped ratios
    (vs DSIR's log-sum: same monotone direction, every step exact
    BIGINT). Integer-floor bound: valid while corpus bigram volume
    < 1e10 per partition of the formula — beyond any probe scale.

    Scale: the weight table is B<=1024 rows (broadcast); T/R are ONE
    fused global aggregate (single sanctioned exchange, truncated from
    the final plan by the rownum checkpoint); ranking is the two-pass
    partition-offset rownum with the portable floor((rn-1)·4/n)
    quartile formula on both sides. Linear in corpus bigram volume.
    """
    from stream_spark.operators.rownum import with_global_row_number
    from stream_spark.operators.text import md5_long, normalize_text, word_ngrams_all

    docs = load_table(spark, sf_dir, "documents")
    par = cpu_partitions(docs)
    bg = (
        docs.select("doc_id", "lang", tokens(normalize_text(F.col("text"))).alias("ws"))
        .repartition(par, "doc_id")
        .select("doc_id", "lang", F.explode(word_ngrams_all(F.col("ws"), 2)).alias("g"))
        .select("doc_id", "lang", (md5_long(F.col("g")) % F.lit(1024)).alias("b"))
    )
    is_t = F.when(F.col("lang") == "en", 1).otherwise(0)
    tot = bg.agg(
        F.count("*").cast("long").alias("r_total"),
        F.sum(is_t).cast("long").alias("t_total"),
    )
    bu = bg.groupBy("b").agg(
        F.count("*").cast("long").alias("rb"),
        F.sum(is_t).cast("long").alias("tb"),
    )
    w = (
        # broadcast-ok: tot is one row by construction (global aggregate)
        bu.crossJoin(F.broadcast(tot)).select(
            "b",
            F.expr(
                "least((((tb + 1) * 10000000000 DIV (t_total + 1024)) * 1000000)"
                " DIV ((rb + 1) * 10000000000 DIV (r_total + 1024)), 1000000000)"
            ).cast("long").alias("wgt"),
        )
    )
    db = bg.groupBy("doc_id", "b").agg(F.count("*").cast("long").alias("c"))
    scored = (
        # broadcast-ok: w is <= 1024 rows by construction (hash buckets)
        db.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("wgt")).cast("long").alias("sw"),
        )
        .withColumn("dsir_score", F.expr("sw DIV n_bigrams").cast("long"))
        .withColumn("neg", -F.col("dsir_score"))
    )
    ranked = with_global_row_number(scored, ["neg", "doc_id"], out="rn")
    # counted AFTER the rownum checkpoint so the audited final plan
    # keeps its single sanctioned single-partition aggregate
    nd = ranked.agg(F.count("*").cast("long").alias("nd"))
    # broadcast-ok: nd is one row by construction (global count)
    ranked = ranked.crossJoin(F.broadcast(nd))
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "dsir_score",
        F.expr("((rn - 1) * 4) DIV nd").cast("long").alias("quartile"),
    )


@register(
    "documents_token_budget_sample",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, source,
               CAST(len({TOKS}) AS BIGINT) AS n_tokens,
               CAST(len(list_filter({TOKS}, w -> w IN ({_STOP_IN}))) AS BIGINT) AS n_stop,
               CAST(length(text) AS BIGINT) AS n_char,
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
               CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS BIGINT) AS n_punct
        FROM documents
    ),
    q AS (SELECT doc_id, source, n_tokens,
                 (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 4 ELSE 0 END
                + CASE WHEN n_stop * 20 >= n_tokens THEN 3 ELSE 0 END
                + CASE WHEN n_digit * 5 <= n_char THEN 2 ELSE 0 END
                + CASE WHEN n_punct * 10 <= n_char THEN 1 ELSE 0 END) AS qscore
          FROM feat),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY source ORDER BY qscore DESC, doc_id) AS rnk,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY qscore DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_tokens
          FROM q)
    SELECT doc_id, source, n_tokens, CAST(qscore AS BIGINT) AS qscore,
           CAST(rnk AS BIGINT) AS rnk, CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(CASE WHEN cum_tokens <= 500 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM r
    """,
)
def documents_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget quota sampling — the data-mixture
    construction step (DoReMi-style fixed per-domain token budgets,
    greedy quality fill): within each source, rank documents by an
    integer quality score (the text_quality_score rubric restated as
    multiplication-free integer comparisons — zero float anywhere),
    run a token running-sum down the ranking, and keep documents until
    the source's token budget (500) is exhausted.

    Determinism: qscore is INT 0..10 (4/3/2/1 for length-in-range,
    stopword floor, low-digit, low-punct via cross-multiplied integer
    comparisons); ties rank by doc_id; the cumulative token sum is
    exact BIGINT. Scale: all windows are PARTITIONED BY source (keyed
    — no global sort); per-source prefix sums are each one partition's
    sequential scan, fine while no single domain dominates the corpus
    — a pathological single-domain corpus would swap in the two-pass
    partition-offset cumsum per key (operators/rownum), same answer.
    """
    from pyspark.sql import Window

    from stream_spark.operators.text import QUALITY_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS))).cast("long")
    n_char = F.length("text").cast("long")
    n_digit = F.length(F.regexp_replace(F.col("text"), r"[^0-9]", "")).cast("long")
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^!-/:-@\[-`{-~]", "")).cast("long")
    q = docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        (
            F.when((n_tok >= 10) & (n_tok <= 1000), 4).otherwise(0)
            + F.when(n_stop * 20 >= n_tok, 3).otherwise(0)
            + F.when(n_digit * 5 <= n_char, 2).otherwise(0)
            + F.when(n_punct * 10 <= n_char, 1).otherwise(0)
        ).cast("long").alias("qscore"),
    )
    w = Window.partitionBy("source").orderBy(F.col("qscore").desc(), "doc_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        q.withColumn("rnk", F.row_number().over(w).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(wsum).cast("long"))
        .withColumn("kept", F.when(F.col("cum_tokens") <= 500, 1).otherwise(0).cast("long"))
    )


@register(
    "documents_blocklist_filter",
    oracle=f"""
    WITH bl AS (
        SELECT unnest(['casino', 'viagra', 'lottery', 'jackpot', 'xxx',
                       'warez', 'phishing', 'clickbait']) AS bad
    ),
    t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    tok AS (SELECT DISTINCT doc_id, lower(unnest(toks)) AS w FROM t),
    hits AS (
        SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bad,
               MIN(tok.w) AS first_bad
        FROM tok JOIN bl ON tok.w = bl.bad
        GROUP BY tok.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_bad, 0) AS n_bad_terms,
           h.first_bad,
           (h.doc_id IS NULL) AS is_kept
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def documents_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist gate (Raffel et al. 2020 §2.2's
    "dirty/obscene word list" rule): a document containing ANY
    blocklisted term is dropped; output is the full audit table (per
    doc: distinct bad-term count, the first offending term as
    evidence, keep flag) rather than a silent filter, because at
    curation scale the REVIEW of what a blocklist removes matters as
    much as the removal. Terms here are a fixed demo list — the
    operator shape (broadcast term set, distinct-token equi-join) is
    what a production list drops into.

    Scale: the blocklist is a bounded broadcast dimension; the probe
    is one equi-join on the distinct-token stream (corpus-linear, no
    regex scan of full text per term — token granularity keeps the
    match vocabulary-bounded) and one keyed count."""
    from stream_spark.operators.text import tokens

    _BLOCK = ["casino", "viagra", "lottery", "jackpot", "xxx", "warez", "phishing", "clickbait"]
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("w0")
    ).select("doc_id", F.lower("w0").alias("w")).distinct()
    bl = spark.createDataFrame([(b,) for b in _BLOCK], "w string")
    hits = (
        tok.join(F.broadcast(bl), "w")  # broadcast-ok: fixed blocklist dimension
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_bad"), F.min("w").alias("first_bad"))
    )
    return docs.select("doc_id").join(hits.withColumnRenamed("doc_id", "hid"),
                                      F.col("doc_id") == F.col("hid"), "left").select(
        "doc_id",
        F.coalesce("n_bad", F.lit(0).cast("long")).alias("n_bad_terms"),
        "first_bad",
        F.col("hid").isNull().alias("is_kept"),
    )
