"""Text-analysis operators for training-data pipelines.

All JVM-side Catalyst expressions (split/regexp/md5/aggregate) — no
Python in the row path. Tokenization = whitespace split of trimmed
text; shingles are word n-grams (char n-grams over a small synthetic
vocabulary produce pathologically hot join keys; word n-grams keep the
inverted-index join keys selective).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.rownum import cpu_partitions

#: small multilingual stopword lists for the lang-id heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "es"),
    "fr": ("le", "la", "de", "et", "est", "un"),
    "zh": ("的", "是", "了", "在", "和"),
}

#: English stopwords used by the quality score
QUALITY_STOPWORDS = STOPWORDS["en"] + ("on", "for", "it")


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse whitespace (shared by dedup + fingerprint)."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


#: Java-regex \s is ASCII-only ([ \t\n\x0b\f\r]) while Python \s is
#: Unicode-aware, and F.trim strips ONLY ' ' — every Python replay of
#: the Catalyst tokenizers must use these spellings or a leading tab /
#: NBSP silently diverges the per-row arithmetic from the batch oracle.
import re as _re

_ASCII_WS = _re.compile(r"[ \t\n\x0b\f\r]+")


def tokens_py(text: str) -> list:
    """Bit-parity Python replay of ``tokens(col)`` =
    F.split(F.trim(col), r"\\s+"): strip spaces only, split on the
    ASCII whitespace class, keep leading/trailing empty tokens exactly
    as Spark's split (limit -1) does."""
    return _ASCII_WS.split(text.strip(" "))


def normalized_tokens_py(text: str) -> list:
    """Bit-parity Python replay of ``tokens(normalize_text(col))``:
    lower → trim(' ') → collapse ASCII whitespace to ' ' → trim(' ')
    → split(' ')."""
    norm = _ASCII_WS.sub(" ", text.lower().strip(" ")).strip(" ")
    return norm.split(" ")


def word_ngrams_all(toks: Column, n: int) -> Column:
    """All word n-grams in document order (duplicates kept); empty
    array when fewer than n tokens. Basis for repetition scoring."""
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + k + 1).cast("int")) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(toks: Column, n: int) -> Column:
    """Distinct word n-grams; empty array when fewer than n tokens."""
    return F.array_distinct(word_ngrams_all(toks, n))


def line_chunks(toks: Column, width: int = 10) -> Column:
    """Document-order "lines" for corpora without newline structure:
    consecutive ``width``-token slices in order (the last may be
    short); empty array for empty docs. C4's line-level rule (Raffel
    et al. 2020 §2.2: drop any line occurring ≥3 times in the corpus)
    needs a line segmentation — on a newline-free word-stream corpus a
    fixed-width chunk is the deterministic stand-in (DuckDB twin:
    list_slice over generate_series).
    """
    n = F.size(toks)
    n_chunks = F.floor((n + F.lit(width - 1)) / F.lit(width)).cast("int")
    seq = F.sequence(F.lit(1), n_chunks)
    grams = F.transform(
        seq, lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * width + 1, width))
    )
    return F.when(n > 0, grams).otherwise(F.array().cast("array<string>"))


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 as BIGINT.

    Reproducible in any engine with md5() — the cross-engine portable
    hash used by minhash/simhash/fingerprints (DuckDB:
    CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of letter-runs / digit-runs / single symbols — a cheap
    proxy for BPE token count."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword / digit / punctuation features + score."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_list = ",".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS)))
    n_char = F.length(F.col(text_col))
    n_digit = F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
    d = (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_stopwords", n_stop)
        .withColumn("stopword_ratio", n_stop / n_tok)
        .withColumn("digit_ratio", n_digit / n_char)
        .withColumn("punct_ratio", n_punct / n_char)
        .withColumn(
            "mean_token_len",
            (n_char - (n_tok - 1)) / n_tok,  # chars minus single separators
        )
    )
    # score: in-range length, some stopwords, low digit/punct noise
    return d.withColumn(
        "quality_score",
        (
            F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 1000), 0.4).otherwise(0.0)
            + F.when(F.col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
            + F.when(F.col("digit_ratio") <= 0.2, 0.2).otherwise(0.0)
            + F.when(F.col("punct_ratio") <= 0.1, 0.1).otherwise(0.0)
        ),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1):
    word-count bounds, mean-word-length bounds, alphabetic-word
    fraction, minimum stop-word hits. Emits one 0/1 flag per rule plus
    the conjunction — keep the flags, not just the verdict, so a
    pipeline can report per-rule rejection rates. All Catalyst
    higher-order functions, zero Python in the row path; counts stay
    integer-exact so the only doubles are two identical divisions."""
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_len = sum_len / n
    alpha_frac = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))).cast("long") / n
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*QUALITY_STOPWORDS))).cast("long")
    flag = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    d = (
        df.withColumn("n_words", n)
        .withColumn("mean_word_len", mean_len)
        .withColumn("alpha_frac", alpha_frac)
        .withColumn("n_stop_hits", n_stop)
        .withColumn("rule_n_words", flag((n >= min_words) & (n <= max_words)))
        .withColumn(
            "rule_mean_len", flag((mean_len >= min_mean_len) & (mean_len <= max_mean_len))
        )
        .withColumn("rule_alpha", flag(alpha_frac >= min_alpha_frac))
        .withColumn("rule_stopwords", flag(n_stop >= min_stop_hits))
    )
    return d.withColumn(
        "gopher_keep",
        flag(
            (F.col("rule_n_words") == 1)
            & (F.col("rule_mean_len") == 1)
            & (F.col("rule_alpha") == 1)
            & (F.col("rule_stopwords") == 1)
        ),
    )


def boilerplate_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    n: int = 3,
    df_frac: float = 0.5,
    min_df: int = 2,
) -> DataFrame:
    """RefinedWeb-style boilerplate detection, adapted to unstructured
    text: an n-gram is boilerplate within a source when it appears in
    ≥ ``df_frac`` of that source's documents AND ≥ ``min_df`` docs
    absolute (the count floor keeps a 1-doc source from declaring its
    whole text boilerplate — headers, footers, navigation chrome,
    license blurbs are what survive both); each doc's boilerplate share
    is the fraction of its distinct n-grams that are hot. Rewriting is
    the caller's policy — this scores, a filter/strip stage acts.

    Scale shape: grams shuffle once on (source, 60-bit gram key) for
    the df count — the same inverted-index build dedup uses; the hot
    set (df-capped, tiny by construction) joins back equi on the same
    key, so nothing corpus-sized is broadcast or recomputed."""
    # explicit repartition before the CPU-heavy tokenize+explode: a
    # small parquet arrives as ONE split and would n-gram the whole
    # corpus single-threaded (same rationale as dedup.shingle_docs)
    par = cpu_partitions(df)
    grams = (
        df.repartition(par, F.col(id_col))
        .select(
            F.col(id_col),
            F.col(source_col),
            F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("_g"),
        )
        .select(id_col, source_col, md5_long(F.col("_g")).alias("_gk"))
        # distinct per (doc, gram): df counts must be document frequency,
        # not occurrence counts — a doc repeating a gram twice must not
        # clear min_df on its own, and shares are over distinct grams
        .distinct()
    )
    dfreq = grams.groupBy(source_col, "_gk").agg(F.count("*").alias("_gdf"))
    sizes = df.groupBy(source_col).agg(F.count("*").alias("_n_docs"))
    hot = (
        dfreq.join(sizes, source_col)
        .filter(
            (F.col("_gdf") >= min_df)
            & (F.col("_gdf") * 1.0 / F.col("_n_docs") >= df_frac)
        )
        .select(source_col, "_gk")
    )
    per_doc = grams.groupBy(id_col, source_col).agg(F.count("*").alias("n_grams"))
    hot_per_doc = (
        grams.join(hot, [source_col, "_gk"]).groupBy(id_col).agg(F.count("*").alias("n_hot"))
    )
    out = per_doc.join(hot_per_doc, id_col, "left").na.fill(0, ["n_hot"])
    return out.select(
        id_col,
        source_col,
        "n_grams",
        "n_hot",
        (F.col("n_hot") / F.col("n_grams")).alias("boilerplate_share"),
    )


def langid_pred(text_col: Column) -> Column:
    """``predicted_lang`` as ONE column expression: tokenization is
    let-bound and evaluated once, per-language stopword hits come from
    a single transform over an indexed literal stoplist matrix, and the
    argmax folds with the same fixed-order strict-> tie-break as
    ``langid``. The projection-collapse-proof path for pipelines that
    only need the prediction — ``langid``'s five hit columns each
    re-inline the tokenization when collapsed into one Project."""
    from stream_spark.operators.dedup import _bind_once

    langs = list(STOPWORDS)
    stop_lits = F.array(*[F.array(*[F.lit(w) for w in STOPWORDS[lang]]) for lang in langs])

    def inner(toks: Column) -> Column:
        hits = F.transform(
            F.sequence(F.lit(0), F.lit(len(langs) - 1)),
            lambda i: F.size(
                F.filter(
                    toks,
                    lambda w: F.array_contains(F.element_at(stop_lits, (i + 1).cast("int")), w),
                )
            ),
        )

        def with_hits(h: Column) -> Column:
            best = F.lit("unknown")
            best_hits = F.lit(0)
            for i, lang in enumerate(langs):  # fixed order = deterministic tie-break
                cond = F.element_at(h, i + 1) > best_hits
                best = F.when(cond, F.lit(lang)).otherwise(best)
                best_hits = F.when(cond, F.element_at(h, i + 1)).otherwise(best_hits)
            return best

        return _bind_once(hits, with_hits)

    return _bind_once(tokens(F.lower(text_col)), inner)


def langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language heuristic with deterministic tie-break
    (langs checked in fixed order, strict > to switch)."""
    toks = tokens(F.lower(F.col(text_col)))

    def hits(words):
        # real closure: pyspark's lambda introspection binds a Column to
        # every declared parameter, so default-arg capture doesn't work
        return F.size(F.filter(toks, lambda w: w.isin(*words)))

    d = df
    for lang, words in STOPWORDS.items():
        d = d.withColumn(f"hits_{lang}", hits(words))
    best = F.lit("unknown")
    best_hits = F.lit(0)
    for lang in STOPWORDS:  # fixed iteration order = deterministic tie-break
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    return d.withColumn("predicted_lang", best)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints per doc: md5-60bit of the normalized text and
    the min rolling word-5-gram hash (winnowing-style, robust to small
    edits)."""
    norm = normalize_text(F.col(text_col))
    grams5 = word_ngrams(tokens(norm), 5)
    min_shingle = F.array_min(F.transform(grams5, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")))
    return df.withColumn("fp_md5", md5_long(norm)).withColumn("fp_min_shingle", min_shingle)


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Within-document repetition scoring (Gopher-style quality
    filter): duplicate-n-gram fraction and top-n-gram fraction.

    Plan shape: explode n-grams → count per (doc, gram) → fold per
    doc. Both shuffles are keyed by doc_id(+gram), so the plan scales
    linearly with the corpus — no broadcast, no driver state, and the
    fractions are exact integer ratios (deterministic doubles).

    Docs with fewer than n tokens produce no n-grams and are dropped
    (no repetition signal exists for them).
    """
    toks = tokens(F.col(text_col))
    grams = df.select(id_col, F.explode(word_ngrams_all(toks, n)).alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.count("*").cast("long").alias("n_distinct"),
            F.max("cnt").cast("long").alias("max_freq"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_distinct",
            ((F.col("n_ngrams") - F.col("n_distinct")).cast("double") / F.col("n_ngrams")).alias(
                "dup_ngram_frac"
            ),
            (F.col("max_freq").cast("double") / F.col("n_ngrams")).alias("top_ngram_frac"),
        )
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many distinct
    word n-grams it shares with a benchmark/eval suite.

    The benchmark side is dimension-sized by contract (eval suites are
    thousands of prompts, not billions of documents), so its distinct
    n-gram set broadcasts; the corpus side streams through a broadcast
    hash join keyed on the gram and aggregates per doc_id — no
    corpus-sized shuffle beyond the per-doc gram explode.
    """
    def grams(d: DataFrame) -> DataFrame:
        return d.select(id_col, F.explode(word_ngrams(tokens(F.col(text_col)), n)).alias("gram"))

    bench = grams(bench_df).select("gram").distinct()
    # broadcast-ok: benchmark suite n-gram set, bounded by contract
    hits = grams(df).join(F.broadcast(bench), "gram")
    return hits.groupBy(id_col).agg(F.count("*").cast("long").alias("n_hits"))


def char_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_entropy: bool = False,
) -> DataFrame:
    """Per-document character-distribution diversity.

    Gibberish / boilerplate detection signal: a natural-language doc
    spreads mass over ~30+ characters, while key-mashing or repeated
    filler concentrates it. Emits exact rational metrics (Simpson
    concentration Σp² and inverse-Simpson effective alphabet n²/Σc²)
    so results are engine-reproducible — no transcendental functions
    in the oracle-checked path. ``with_entropy`` adds Shannon entropy
    in bits (JVM log2 — deterministic within Spark but not
    bit-portable across engines, so kept out of gated results).

    Scale: one explode linear in corpus characters, two keyed
    aggregations on (doc, char) then (doc) — no joins, no driver state.
    """
    counts = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch"))
        # Java regex split(limit=-1) can keep a trailing zero-width
        # match as ''; DuckDB's string_split never does — drop it
        .filter(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count("*").alias("_c"))
    )
    aggs = [
        F.sum("_c").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("distinct_chars"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_sum_c2"),
    ]
    if with_entropy:
        aggs.append(
            F.sum(
                (F.col("_c").cast("double") * F.log2(F.col("_c").cast("double"))).cast(
                    "decimal(28,10)"
                )
            ).alias("_clog2")
        )
    per_doc = counts.groupBy(id_col).agg(*aggs)
    out = per_doc.withColumn(
        "simpson",
        F.col("_sum_c2").cast("double")
        / (F.col("n_chars") * F.col("n_chars")).cast("double"),
    ).withColumn(
        "effective_alphabet",
        (F.col("n_chars") * F.col("n_chars")).cast("double")
        / F.col("_sum_c2").cast("double"),
    )
    cols = [id_col, "n_chars", "distinct_chars", "simpson", "effective_alphabet"]
    if with_entropy:
        out = out.withColumn(
            "entropy_bits",
            F.log2(F.col("n_chars").cast("double"))
            - F.col("_clog2").cast("double") / F.col("n_chars").cast("double"),
        )
        cols.append("entropy_bits")
    return out.select(*cols)


def ngram_hits_rows(
    df: DataFrame,
    bench_grams,
    n: int = 4,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Arrow-batched stateless decontamination scorer — the ONLINE
    deployment shape of `decontaminate`: the benchmark/eval n-gram set
    is built offline (bounded by contract: eval suites are thousands of
    prompts, not billions of documents), frozen into a Python
    frozenset, and each incoming document is scored per row with the
    count of its DISTINCT word n-grams present in the set. No state
    store, no shuffle — streaming-legal ahead of a dashboard aggregate.

    Tokenization replays `tokens()` exactly via ``tokens_py`` (trim of
    ' ' only + ASCII-whitespace split, no lowering — the same TOKS
    spelling the batch oracle uses; Python str.strip()/\\s are
    Unicode-aware and would diverge on leading tabs / NBSP), so the
    per-doc hit count is bit-identical to the batch join path.
    """
    bset = frozenset(bench_grams)
    schema = ", ".join([f"{c} string" for c in keep_cols] + ["n_hits long"])

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            hits, keeps = [], {c: [] for c in keep_cols}
            for idx in range(len(pdf)):
                ws = tokens_py(str(pdf[text_col].iloc[idx]))
                grams = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
                hits.append(len(grams & bset))
                for c in keep_cols:
                    keeps[c].append(pdf[c].iloc[idx])
            out = {c: keeps[c] for c in keep_cols}
            out["n_hits"] = pd.Series(hits, dtype="int64")
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=schema)
