"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale design (100 TB):
- exact: group on the md5 digest of normalized text, never the raw
  text — the shuffle carries 16-byte keys, not documents.
- jaccard: inverted-index self-join on word n-grams (docs sharing ≥1
  shingle), never an all-pairs cross join; candidate volume is
  Σ freq(shingle)² which word n-grams keep small.
- minhash/LSH: fixed-size signatures (PERMS hashes) per doc, banded;
  the only shuffle is on (band, bucket); bucket sizes are bounded, so
  the in-bucket pair join is bounded.
- simhash: pairs must share a PAIR of equal signature chunks
  (pigeonhole: ≤3 differing bits over 6 chunks ⇒ ≥3 equal chunks ⇒
  ≥1 equal chunk pair), so the join is an equi-join on 20-bit
  chunk-pair keys — exact, no cross join, bounded bucket frequency.
- embedding-cosine: exact decimal dot products; all-pairs only within
  LSH buckets at scale (see similarity.py); brute variant kept for
  small/verification use.

All hashes are md5-derived (see text.md5_long) so any engine can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.rownum import cpu_partitions
from stream_spark.operators.text import md5_long, normalize_text, tokens, word_ngrams

PERMS = 16
BAND_SIZE = 4
SIMHASH_BITS = 60


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative (min id) per distinct normalized text."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("content_key"))
        .groupBy("content_key")
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count("*").alias("n_copies"))
        .select("keeper_doc_id", "n_copies")
    )


def shingle_docs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct word n-grams of normalized text.

    Tokenization is materialized behind a hash-repartition on the doc
    id before the n-gram explode: a small parquet arrives as ONE input
    split, and without the exchange the whole corpus would tokenize +
    explode single-threaded (and projection collapse would re-inline
    the split() per element access). The exchange buys even
    parallelism and a once-per-row token array.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        tokens(normalize_text(F.col(text_col))).alias("ws"),
    )
    # explicit partition count: AQE would coalesce this ~10 MB shuffle
    # to 1-2 partitions by size, but the downstream explode+hash work is
    # CPU-bound — spread it over every core
    par = cpu_partitions(df)
    return toks.repartition(par, F.col("doc")).select(
        "doc", F.explode(word_ngrams(F.col("ws"), n)).alias("g")
    )


def _materialize_index(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint an inverted-index frame that MULTIPLE
    downstream subtrees consume (sizes + both self-join sides, or the
    df-cut + verification joins). Without the cut Catalyst re-evaluates
    the whole tokenize→explode→(cut) pipeline once per consuming
    subtree — measured at sf0.1 (r9 A/B, steady-state): capped Jaccard
    2.28→0.38 s, exact-substring 1.87→0.37 s, banded verify 1.12→0.73 s.
    This is the stage-materialization boundary a production pipeline
    writes anyway (the index is reused, not re-derived); localCheckpoint
    persists executor-local — same data volume the next shuffle would
    spill. eager=False (r10): the cache write runs at the caller's
    FIRST action instead of at DataFrame construction — the same
    compute-once guarantee (every consumer reads the one cached RDD),
    without the construction-time side effect that silently moved work
    out of the old bench window (ADVICE r9). Stats caveat (CLAUDE.md):
    checkpointed frames carry sentinel size stats, so nothing
    downstream may RELY on auto-broadcast of a derived frame — these
    indexes are doc/fp-keyed shuffle-join inputs by design and are
    documented never-broadcast."""
    return df.localCheckpoint(eager=False)


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word n-gram sets, via inverted-index join.

    ``max_doc_freq``: drop shingles appearing in more than this many
    docs before the self-join. Candidate volume is Σ freq(shingle)², so
    one stop-shingle in 1M docs costs 10^12 pairs — the df-cut keeps
    the join bounded at corpus scale. It changes semantics (Jaccard
    over the pruned sets), so the oracle-checked query leaves it off.
    """
    sh = shingle_docs(df, text_col, id_col, n)
    if max_doc_freq is not None:
        rare = sh.groupBy("g").count().filter(F.col("count") <= max_doc_freq).select("g")
        sh = sh.join(rare, "g")
    # the (post-cut) shingle index feeds sizes AND both self-join sides
    sh = _materialize_index(sh)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    co = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    # sizes is one row per DOCUMENT — O(corpus), never broadcast it;
    # these are shuffle joins on the doc id (AQE may still pick
    # broadcast at small SF after measuring, which is fine)
    return (
        co.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc"))
        .withColumn("jaccard", F.col("common") / (F.col("sa.sz") + F.col("sb.sz") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def banded_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket_size: int | None = None,
    block_size: int | None = None,
) -> DataFrame:
    """Exact Jaccard verified ONLY on MinHash-band candidate pairs —
    the production crawl-dedup shape (Lee et al. "Deduplicating
    Training Data Makes Language Models Better"; SlimPajama): the LSH
    band index proposes, exact set overlap disposes.

    Why this exists next to ``ngram_jaccard_pairs``: the direct
    inverted-index self-join enumerates Σ freq(shingle)² candidates —
    measured 100.1× volume at 10× data on planted-clique corpora
    (SCALE_PROBE r7) because m near-identical docs share ~all shingles
    and every shingle contributes m² pairs. Band candidates are
    bounded by band-bucket collisions instead: the same m-doc clique
    costs m²/2 CANDIDATES once (distinct pairs), not once per shared
    shingle, and unrelated docs never meet. Verification work is then
    |candidates| × avg doc shingle count — linear joins end to end.

    Semantics: emits the subset of true-Jaccard-≥-threshold pairs that
    agree on ≥1 of the PERMS/BAND_SIZE minhash bands (recall < 1 by
    construction, characterized in tests/test_dedup.py); every emitted
    jaccard value is EXACT over the full shingle sets, unlike the
    df-cut variant which scores pruned sets. ``max_bucket_size`` /
    ``block_size`` pass through to ``minhash_lsh_candidates`` for
    adversarial-swarm control (blocked path: identical candidates,
    bounded join tasks).
    """
    # ONE tokenize+explode pass for the whole query (r11, guide §2.4):
    # the materialized shingle index feeds the signature build (via
    # ``shingles=``), sizes, AND both verification joins — previously
    # the candidate path re-ran its own shingle_docs pass.
    # ONE aggregation pass builds the per-doc PROFILE (r12, guide
    # §2.3/§8 — decide with small rows, never shuffle the per-shingle
    # rows into a pair join): the 60-bit md5 of each shingle
    # (``gh = md5_long(g)`` — the signature's own base hash, folded
    # once in the shared pass; md5_long is the sanctioned hash, oracle
    # rule 2) feeds a single groupBy(doc) that yields the minhash
    # signature AND the doc's hashed shingle set as one array column.
    # Exchange-free: shingle_docs already hash-partitions on doc.
    # The exploded shingle frame then has exactly ONE consumer, so the
    # r9-r11 index pin moves to the COMPACT profile (one row per doc:
    # 60 longs + the ~shingles/doc array), which the candidate
    # self-join sides and both verification lookups read from cache.
    #
    # Verification joins each candidate pair to its two profile rows
    # and intersects the arrays IN-ROW: ``common = |gs_a ∩ gs_b|`` and
    # the sizes are the array sizes — identical values to the former
    # expand-by-shingles + count spelling ((doc, g) rows are distinct,
    # so per-doc counts and overlap counts are unchanged absent a
    # 60-bit md5 collision inside one candidate pair; the 3-SF oracle
    # gate pins the results). What this removes at every scale: the
    # |cand| × shingles/doc expanded frame and its exchange, the
    # per-pair aggregation, the separate sizes pass and both sizes
    # joins. The clique lower bound (m²/2 pairs) now costs m²/2
    # in-row array intersections instead of m²/2 × shingles/doc
    # shuffled rows.
    sh = shingle_docs(df, text_col, id_col, n).select(
        "doc", md5_long(F.col("g")).alias("gh")
    )
    prof = _materialize_index(
        minhash_signatures(df, text_col, id_col, n, shingles=sh, keep_set=True)
    )
    cand = minhash_lsh_candidates(
        df, text_col, id_col, n,
        max_bucket_size=max_bucket_size, block_size=block_size,
        # cand is consumed once here and Catalyst reuses the band
        # exchange across the self-join sides — the eager write is pure
        # overhead in this composition (+15% measured, r9)
        materialize=False,
        sigs=prof,
    )
    # prof is one row per DOCUMENT — O(corpus), never broadcast it
    pa = prof.select(F.col("doc").alias("_da"), F.col("gs").alias("_gsa"))
    pb = prof.select(F.col("doc").alias("_db"), F.col("gs").alias("_gsb"))
    return (
        cand.join(pa, cand["doc_a"] == F.col("_da"))
        .join(pb, cand["doc_b"] == F.col("_db"))
        .withColumn("common", F.size(F.array_intersect(F.col("_gsa"), F.col("_gsb"))))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size(F.col("_gsa")) + F.size(F.col("_gsb")) - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric containment C(A→B) = |A∩B| / |A| over word n-gram
    sets — catches quote/snippet inclusion that symmetric Jaccard
    misses (a 50-gram doc fully quoted inside a 5000-gram doc has
    Jaccard ≈ 0.01 but containment 1.0). Same inverted-index join and
    df-cut as ``ngram_jaccard_pairs``; emits both directions' scores
    for pairs where either direction clears the threshold.
    """
    sh = shingle_docs(df, text_col, id_col, n)
    if max_doc_freq is not None:
        rare = sh.groupBy("g").count().filter(F.col("count") <= max_doc_freq).select("g")
        sh = sh.join(rare, "g")
    # the (post-cut) shingle index feeds sizes AND both self-join sides
    sh = _materialize_index(sh)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    co = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    # sizes is one row per DOCUMENT — O(corpus), never broadcast it
    return (
        co.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc"))
        .withColumn("containment_ab", F.col("common") / F.col("sa.sz"))
        .withColumn("containment_ba", F.col("common") / F.col("sb.sz"))
        .filter(
            (F.col("containment_ab") >= threshold) | (F.col("containment_ba") >= threshold)
        )
        .select("doc_a", "doc_b", "containment_ab", "containment_ba")
    )


def _gram_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(doc, fp) rows: one 60-bit md5 fingerprint per DISTINCT k-token
    gram of the normalized text. The join/aggregation key for the
    exact-substring family — joining on the BIGINT instead of the gram
    string keeps shuffle rows fixed-width at crawl scale, and md5_long
    is the repo's only oracle-replayable hash (CLAUDE.md rule 2)."""
    from stream_spark.operators.text import md5_long, normalize_text, tokens, word_ngrams

    toks = df.select(
        F.col(id_col).alias("doc"),
        tokens(normalize_text(F.col(text_col))).alias("ws"),
    )
    par = cpu_partitions(df)
    # same exchange rationale as shingle_docs: materialize the token
    # array once behind a hash repartition, spread the explode+hash
    return toks.repartition(par, F.col("doc")).select(
        "doc", F.explode(word_ngrams(F.col("ws"), k)).alias("g")
    ).select("doc", md5_long(F.col("g")).alias("fp"))


def exact_substring_pairs(
    df: DataFrame,
    k: int = 5,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact-substring duplicate pairs: (doc_a < doc_b) sharing at
    least ``min_shared`` verbatim ``k``-token spans — the
    suffix-array-style "train-set contains a verbatim copy" notion
    (ExactSubstr), realized Spark-first as a rolling k-gram
    fingerprint inverted-index equi-join instead of a monolithic
    suffix array (which would serialize the corpus through one
    machine). A shared k-gram IS a shared k-token substring, so the
    predicate is exact for span length k; longer shared spans simply
    contribute more grams (surfaced as ``shared_grams``).

    ``max_doc_freq`` is the same df-cut as the Jaccard family: a
    boilerplate k-gram in 10⁶ docs costs 10¹² join pairs, so the
    crawl-scale path drops grams above the cap before the self-join
    (pairs are then "share a RARE k-token span" — the cut is replayed
    in the oracle's HAVING so the gate stays exact).
    """
    sh = _gram_fingerprints(df, text_col, id_col, k)
    if max_doc_freq is not None:
        rare = sh.groupBy("fp").count().filter(F.col("count") <= max_doc_freq).select("fp")
        sh = sh.join(rare, "fp")
    # the (post-cut) gram index feeds both self-join sides
    sh = _materialize_index(sh)
    return (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").cast("bigint").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )


def substring_dup_coverage(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document exact-substring duplication stats: of a document's
    distinct k-token grams, how many also appear in ANY other document
    (``dup_grams``) and the fraction (``dup_fraction``) — the "what
    would ExactSubstr delete" targeting measure. No self-join anywhere:
    one groupBy computes each gram's doc-frequency, one join back and
    one keyed aggregate do the rest, so the operator is linear in
    corpus gram volume and needs no df-cut at 100 TB.
    """
    # the gram index feeds the doc-frequency aggregate AND the join
    # back — materialize the explode once (r9 _materialize_index)
    sh = _materialize_index(_gram_fingerprints(df, text_col, id_col, k))
    freq = sh.groupBy("fp").agg(F.count("*").alias("n_docs"))
    return (
        sh.join(freq, "fp")
        .groupBy("doc")
        .agg(
            F.count("*").cast("bigint").alias("total_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).cast("bigint").alias("dup_grams"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            "total_grams",
            "dup_grams",
            (F.col("dup_grams") / F.col("total_grams")).cast("double").alias("dup_fraction"),
        )
    )


MERSENNE31 = 2_147_483_647


def perm_consts(p: int) -> tuple[int, int]:
    """Affine permutation constants for minhash p (shared with the SQL
    oracle): h_p = (a·h + b) mod 2^31-1."""
    a = (2_654_435_761 * (p + 1)) % MERSENNE31
    b = (40_503 * (p + 1) + 17) % MERSENNE31
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles: DataFrame | None = None,
    keep_set: bool = False,
) -> DataFrame:
    """PERMS min-hashes per doc.

    One md5 per shingle, then PERMS cheap affine permutations
    h_p = (a_p·h31 + b_p) mod 2^31-1 over the 31-bit base hash —
    ~PERMS× less hashing than md5-per-permutation, and a·h stays under
    2^62 so the arithmetic is exact BIGINT in any engine.

    ``shingles``: a precomputed ``shingle_docs`` frame (columns
    ``doc``, ``g`` — or ``doc``, ``gh`` when pre-hashed). Callers that
    ALSO need the exploded shingle index (the banded verify-on-
    candidates family) pass their materialized index here so the
    corpus is tokenized + exploded ONCE per query instead of once per
    consumer (guide §2.4: remove repeated passes).

    ``keep_set``: additionally aggregate the doc's hashed shingle SET
    as an array column ``gs`` in the SAME groupBy (requires a
    pre-hashed ``shingles`` frame) — the banded verify family's
    profile: one aggregation pass yields both the signature and the
    exact-verification payload, so the exploded index needs no second
    consumer (r12, guide §2.3/§8 — the heavy per-shingle rows never
    feed a pair join; candidate pairs join two compact profile rows
    and intersect arrays instead).
    """
    sh = shingles if shingles is not None else shingle_docs(df, text_col, id_col, n)
    # a pre-hashed index (column ``gh`` = md5_long(g)) folds to the
    # identical base hash: h31 = md5_long(g) % M31 = gh % M31
    base = F.col("gh") if "gh" in sh.columns else md5_long(F.col("g"))
    sh = sh.withColumn("h31", base % MERSENNE31)
    aggs = []
    for p in range(PERMS):
        a, b = perm_consts(p)
        aggs.append(F.min((F.lit(a) * F.col("h31") + F.lit(b)) % MERSENNE31).alias(f"mh{p}"))
    if keep_set:
        if shingles is None or "gh" not in shingles.columns:
            raise ValueError("keep_set requires a pre-hashed shingles frame (doc, gh)")
        aggs.append(F.collect_list(F.col("gh")).alias("gs"))
    return sh.groupBy("doc").agg(*aggs)


def _explode_band_buckets(sigs: DataFrame) -> DataFrame:
    """(doc, mh0..mhPERMS-1) signature rows → (doc, band, bucket) LSH
    index rows (bucket = md5 of the band's comma-joined hash run)."""
    n_bands = PERMS // BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(",", *[F.col(f"mh{b * BAND_SIZE + k}").cast("string") for k in range(BAND_SIZE)])
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return sigs.select("doc", F.explode(bands).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc, band, bucket) LSH index rows — the joinable form of the
    banded minhash signature (bucket = md5 of the band's hash run).
    ``shingles`` passes through to ``minhash_signatures``."""
    return _explode_band_buckets(minhash_signatures(df, text_col, id_col, n, shingles=shingles))


def _bind_once(expr, f):
    """Let-binding for Catalyst expressions: evaluate ``expr`` exactly
    once and pass it to ``f`` as a lambda variable. Higher-order-function
    lambdas are interpreted (no whole-stage codegen), and any expression
    referenced from several lambda bodies gets INLINED — re-evaluated —
    at every use site; wrapping it as the sole element of a transform
    makes every downstream reference a cheap bound-variable lookup.
    """
    return F.element_at(F.transform(F.array(expr), f), 1)


def minhash_band_rows_stateless(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """Same (doc, band, bucket) rows as ``minhash_band_buckets``, but as
    PURE per-row projections — no explode/groupBy — so it is
    streaming-legal ahead of a stateful fold AND the hashing stays
    JVM-side, never Python.

    The whole signature is ONE nested expression with every stage
    let-bound (``_bind_once``) so it evaluates exactly once per row:
    tokens → shingle array → one md5 per shingle (31-bit base array) →
    PERMS affine ``array_min`` scans (a·h stays under 2^62 — exact
    BIGINT) → band buckets. Without the bindings, projection collapse
    re-inlines the shingle/md5 work into each of the PERMS min
    expressions (measured 15 s vs 0.7 s on sf0.1 documents). The
    repartition before the projection materializes the token array
    behind an exchange (same rationale as ``shingle_docs``) and spreads
    the CPU-bound hashing over every core — streaming-legal (stateless
    shuffle). Bit-identical to the batch/SQL form: min over distinct
    shingles == min over exploded rows; docs with < n tokens emit no
    rows, matching the explode+groupBy path.
    """
    n_bands = PERMS // BAND_SIZE
    a_consts = F.array(*[F.lit(perm_consts(p)[0]) for p in range(PERMS)])
    b_consts = F.array(*[F.lit(perm_consts(p)[1]) for p in range(PERMS)])

    h31 = F.transform(word_ngrams(F.col("ws"), n), lambda g: md5_long(g) % MERSENNE31)
    mh = _bind_once(
        h31,
        lambda hs: F.transform(
            F.sequence(F.lit(0), F.lit(PERMS - 1)),
            lambda p: F.array_min(
                F.transform(
                    hs,
                    lambda h: (
                        F.element_at(a_consts, (p + 1).cast("int")) * h
                        + F.element_at(b_consts, (p + 1).cast("int"))
                    )
                    % MERSENNE31,
                )
            ),
        ),
    )
    bands = _bind_once(
        mh,
        lambda m: F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.cast("int").alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.sequence(F.lit(0), F.lit(BAND_SIZE - 1)),
                            lambda k: F.element_at(m, (b * BAND_SIZE + k + 1).cast("int")).cast("string"),
                        ),
                        ",",
                    )
                ).alias("bucket"),
            ),
        ),
    )
    # parallelism: task count of the CPU-bound hashing stage. The
    # default (every core) is right for batch corpora; a streaming
    # micro-batch of ~1k docs over-splits at 32 tasks (scheduling
    # overhead rivals the hash work) — callers with small triggers pass
    # their state-partition count instead. parallelism=0 skips the
    # repartition entirely: the hashing then runs INSIDE the scan
    # stage, pipelined into the downstream shuffle — the right shape
    # when the source is already split-parallel (many files, or
    # row-group-splittable parquet under a small maxPartitionBytes),
    # saving one whole exchange per micro-batch.
    toks = df.select(
        F.col(id_col).cast("long").alias("doc"),
        tokens(normalize_text(F.col(text_col))).alias("ws"),
    )
    if parallelism != 0:
        par = parallelism or cpu_partitions(df)
        toks = toks.repartition(par, F.col("doc"))
    return (
        toks.filter(F.size(F.col("ws")) >= n)  # word_ngrams empty iff < n tokens
        .select("doc", F.explode(bands).alias("bb"))
        .select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_band_rows_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """(doc, band, bucket) minhash LSH index rows computed in ONE
    Arrow pass per batch — bit-identical to ``minhash_band_buckets``
    and ``minhash_band_rows_stateless`` (pytest asserts row-for-row
    equality against both, including the hostile-whitespace suite).
    This is the STREAMING-side replacement for the stateless HOF
    chain: HOF lambdas are interpreted, and the interleaved sf1 A/B
    measured stateless 1.26 s vs arrow 0.97 s vs batch explode+groupBy
    0.73 s (warm min-of-3). Batch consumers keep
    ``minhash_band_buckets`` — its md5 + simple aggregates run inside
    whole-stage codegen and remain the fastest spelling; a streaming
    plan can't use it (a pre-fold groupBy would be a streaming
    aggregation), so arrow is the fast streaming-legal form.

    Arithmetic is integer-exact end to end, so unlike the cosine
    kernels no escape hatch is needed: tokenization replays the
    Catalyst spelling via ``normalized_tokens_py`` (trim ' ' only,
    ASCII \\s — the r6-pinned parity contract), hashing is the same
    md5→15-hex→BIGINT, and the PERMS affine scans run as one numpy
    (PERMS × total_grams) matrix with ``np.minimum.reduceat`` per doc
    segment (a·h < 2^62: exact int64). Docs with < n tokens or NULL
    text emit no rows, matching both Catalyst paths.

    Scale shape: map-only (same as stateless — streaming-legal), the
    same ``parallelism`` contract (None = every core via
    cpu_partitions, 0 = no repartition, hash inside the scan stage)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from stream_spark.operators.text import normalized_tokens_py

    n_bands = PERMS // BAND_SIZE
    A = np.array([perm_consts(p)[0] for p in range(PERMS)], dtype=np.int64)
    B = np.array([perm_consts(p)[1] for p in range(PERMS)], dtype=np.int64)

    def gen(batches):
        md5 = hashlib.md5
        for pdf in batches:
            seg_h, starts, keep, pos = [], [], [], 0
            for doc, text in zip(pdf["doc"].to_numpy(), pdf["txt"]):
                if text is None:
                    continue
                toks = normalized_tokens_py(text)
                if len(toks) < n:
                    continue
                grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
                seg_h.append(
                    np.fromiter(
                        (int(md5(g.encode("utf-8")).hexdigest()[:15], 16) for g in grams),
                        dtype=np.int64,
                        count=len(grams),
                    )
                )
                starts.append(pos)
                keep.append(doc)
                pos += len(grams)
            if not keep:
                continue
            H = np.concatenate(seg_h) % MERSENNE31
            MH = (A[:, None] * H[None, :] + B[:, None]) % MERSENNE31  # (PERMS, G)
            sig = np.minimum.reduceat(MH, np.array(starts), axis=1)  # (PERMS, n_docs)
            ids = np.array(keep, dtype=np.int64)
            buckets = [
                md5(
                    ",".join(
                        str(int(sig[b * BAND_SIZE + k, d])) for k in range(BAND_SIZE)
                    ).encode()
                ).hexdigest()
                for d in range(len(keep))
                for b in range(n_bands)
            ]
            yield pd.DataFrame(
                {
                    "doc": np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(keep)),
                    "bucket": buckets,
                }
            )

    src = df.select(F.col(id_col).cast("long").alias("doc"), F.col(text_col).alias("txt"))
    if parallelism != 0:
        par = parallelism or cpu_partitions(df)
        src = src.repartition(par, F.col("doc"))
    return src.mapInPandas(gen, "doc long, band int, bucket string")


def incremental_dedup_flags(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Incremental (online) dedup — the production crawl shape: flag
    which NEW documents are near-dups of the EXISTING corpus without
    ever pairing the corpus against itself.

    The corpus side collapses to its DISTINCT (band, bucket) index
    rows before the join, so each new band row meets at most one
    index row — no bucket-size² blowup is possible by construction,
    and the shuffle is one equi-join keyed on (band, bucket). At
    100 TB the corpus index is precomputed once and stored
    (minhash_band_buckets output is a plain table); each day's batch
    joins against it and appends its own rows.

    Returns (doc_id, is_dup 0/1) for every new document.
    """
    nb = minhash_band_buckets(new_df, text_col, id_col, n)
    cb = (
        minhash_band_buckets(corpus_df, text_col, id_col, n)
        .select("band", "bucket")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = nb.join(cb, ["band", "bucket"], "left")
    return joined.groupBy(F.col("doc").alias(id_col)).agg(
        F.max(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("is_dup")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_bucket_size: int | None = None,
    block_size: int | None = None,
    materialize: bool = True,
    shingles: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on any minhash band.
    ``shingles`` passes through to the signature build (see
    ``minhash_signatures``); ``sigs`` skips it entirely — a
    precomputed (doc, mh0..mhPERMS-1, ...) signature frame (extra
    columns ignored), the r12 profile-reuse hook.

    ``materialize``: localCheckpoint the band-bucket table before the
    self-join (r9 A/B: −26% plain / −19% blocked — the signature
    computation otherwise runs once per join side). Callers that
    consume the RESULT once inside a larger plan whose join sides
    Catalyst already serves from one reused exchange
    (banded_jaccard_pairs) pass False — there the eager write is pure
    overhead (+15% measured).

    Hot-bucket controls for adversarial corpora (a bucket of m docs
    yields m² pairs — one 10⁶-doc boilerplate bucket is 10¹² pairs):

    - ``max_bucket_size``: DROP buckets larger than this before pairing
      (changes the candidate set; oversized buckets are near-identical
      swarms better routed through exact_dedup first).
    - ``block_size``: blocked pair generation — members of a bucket are
      split into deterministic hash blocks of ~block_size and the
      self-join key becomes (band, bucket, block), so no join task ever
      builds more than ~block_size rows. SAME candidate pairs, bounded
      tasks; costs one extra bucket-size shuffle, so it's opt-in (the
      oracle-gated query runs with both off — test corpora have no hot
      buckets).
    """
    exploded = (
        _explode_band_buckets(sigs)
        if sigs is not None
        else minhash_band_buckets(df, text_col, id_col, n, shingles=shingles)
    )
    if materialize:
        exploded = _materialize_index(exploded)
    if max_bucket_size is not None or block_size is not None:
        sizes = exploded.groupBy("band", "bucket").agg(F.count("*").alias("_bsz"))
        exploded = exploded.join(sizes, ["band", "bucket"])
        if max_bucket_size is not None:
            exploded = exploded.filter(F.col("_bsz") <= max_bucket_size)

    if block_size is None:
        pairs = (
            exploded.alias("a")
            .join(
                exploded.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        )
    else:
        nb = F.greatest(F.lit(1), F.ceil(F.col("_bsz") / block_size)).cast("int")
        member = exploded.withColumn("_nb", nb).withColumn(
            "_blk", F.pmod(md5_long(F.col("doc").cast("string")), F.col("_nb")).cast("int")
        )
        # each member probes every partner block; the partner side is
        # keyed by its own block, so per-key build size ≈ block_size
        probe = member.withColumn("_pblk", F.explode(F.sequence(F.lit(0), F.col("_nb") - 1)))
        partner = member.select(
            F.col("doc").alias("doc_b"), "band", "bucket", F.col("_blk").alias("_pblk")
        )
        pairs = (
            probe.join(partner, ["band", "bucket", "_pblk"])
            .filter(F.col("doc") < F.col("doc_b"))
            .select(F.col("doc").alias("doc_a"), "doc_b")
        )
    return pairs.distinct()


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over distinct tokens of the normalized text.

    Bit j of the signature is the sign of Σ_tokens (±1) where the sign
    is bit j of the token's 60-bit md5 hash. Realized (r11) as ONE
    per-row projection: a single ``aggregate`` pass folds the hashed
    token array into a 60-long bit-count accumulator (``zip_with`` add
    — the accumulator stays fixed-size, no per-step copy growth), and
    the signature packs the signs ``2·count_j − n_tokens ≥ 0``. No bit
    explode (the old form generated tokens×60 rows), no (doc, bit) or
    (doc) aggregation exchanges — only the CPU repartition remains.
    Interleaved A/B (warm min-of-3): 0.70 → 0.37 s at sf0.1, 1.06 →
    0.60 s at sf1 — the win HOLDS at 10× data, unlike the per-row
    minhash spelling (see minhash_band_rows_arrow's docstring), because
    the explode form's row generation + hash-table upserts cost more
    than the interpreted fold. (Earlier measured-and-rejected forms: a
    60-conditional-sum single aggregate — the wide buffer defeats
    codegen; 60 separate F.aggregate passes — re-scans the array per
    bit. The one-pass fixed-width accumulator is neither.)

    The bit-count array is LET-BOUND (sole element of a ``transform``
    over a 1-element array, same pattern as ``_bind_once``) so the 60
    sign tests reference a lambda variable — projection collapse can
    never re-inline the fold into each test. Integer arithmetic end to
    end: results are bit-identical to the explode spelling (parity
    pytest) and engine-portable (md5-derived hash only)."""
    n = SIMHASH_BITS
    md5_sql = "CAST(conv(substr(md5(w), 1, 15), 16, 10) AS BIGINT)"
    # shiftright/shiftleft FUNCTION spellings, not the >>/<< operators:
    # the SQL parser rejects the operators inside a nested lambda
    bits_sql = f"""aggregate(
        transform(ws, w -> {md5_sql}),
        array_repeat(CAST(0 AS BIGINT), {n}),
        (acc, h) -> zip_with(acc, transform(sequence(0, {n - 1}), j -> shiftright(h, j) & 1),
                             (a, b) -> a + b))"""
    sig_sql = f"""element_at(transform(array({bits_sql}), _sb ->
        aggregate(
            transform(sequence(0, {n - 1}),
                      j -> IF(2 * element_at(_sb, j + 1) - CAST(size(ws) AS BIGINT) >= 0,
                              shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
            CAST(0 AS BIGINT), (a, x) -> a + x)), 1)"""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(tokens(normalize_text(F.col(text_col)))).alias("ws"),
        )
        .repartition(cpu_partitions(df), F.col("doc"))
        .filter(F.size(F.col("ws")) > 0)
        .select("doc", F.expr(sig_sql).alias("simhash"))
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_chunks: int = 6,
) -> DataFrame:
    """Pairs with Hamming distance ≤ max_hamming, via chunk-PAIR
    blocking (second-level pigeonhole).

    d differing bits touch ≤ d of the n_chunks signature chunks, so a
    qualifying pair agrees on ≥ n_chunks - d chunks. Partition the
    chunks into g groups: if d ≤ n_chunks - g - 1, some group has ≥ 2
    equal chunks (distributing d "hits" over the groups can spoil at
    most g·(size-1) = n_chunks - g chunks-worth of pairs), so the pair
    agrees on a chunk-PAIR drawn WITHIN one group. The join key is
    (pair_id, value_i, value_j) — 2× the chunk bits — so bucket
    frequency (and the freq² candidate volume that kills the
    single-chunk scheme at 10⁹ docs) collapses: a 15-bit chunk bucket
    of m docs becomes ~m/2^10 per 20-bit key. With the largest exact
    g, the explode is Σ_groups C(size,2) rows per doc — for the
    default (d=3, 6 chunks, g=2 groups of 3) that is 6 rows, barely
    more than the 4 of the old single-chunk scheme.
    Exact — no candidate missed — for max_hamming ≤ n_chunks - 2.
    """
    if max_hamming > n_chunks - 2:
        raise ValueError(
            f"chunk-pair blocking is exact only for max_hamming <= n_chunks - 2 "
            f"(got max_hamming={max_hamming}, n_chunks={n_chunks})"
        )
    sigs = simhash(df, text_col, id_col)
    chunk_bits = SIMHASH_BITS // n_chunks
    mask = (1 << chunk_bits) - 1

    def chunk(c: int):
        return F.shiftright(F.col("simhash"), c * chunk_bits).bitwiseAND(F.lit(mask))

    # largest group count that stays exact; groups need ≥2 chunks
    g = max(1, min(n_chunks // 2, n_chunks - max_hamming - 1))
    bounds = [round(i * n_chunks / g) for i in range(g + 1)]
    combos = [
        (i, j)
        for lo, hi in zip(bounds, bounds[1:])
        for i in range(lo, hi)
        for j in range(i + 1, hi)
    ]
    chunks = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i * n_chunks + j).alias("cp"),
                        chunk(i).alias("vi"),
                        chunk(j).alias("vj"),
                    )
                    for i, j in combos
                ]
            )
        ).alias("ch"),
    ).select(
        "doc", "simhash", F.col("ch.cp").alias("cp"), F.col("ch.vi").alias("vi"), F.col("ch.vj").alias("vj")
    )
    # the chunk-pair table (simhash signatures over the corpus token
    # stream) feeds both self-join sides — materialize once (r9)
    chunks = _materialize_index(chunks)
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.cp") == F.col("b.cp"))
            & (F.col("a.vi") == F.col("b.vi"))
            & (F.col("a.vj") == F.col("b.vj"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


#: winnowing selection-hash encoding: key = h31 * 2^24 + (2^24-1-pos).
#: 31-bit selection hash + 24-bit position fit in 55 bits, so window
#: MINs stay exact BIGINT in any engine; positions are bounded by
#: 2^24-1 grams per document (a 16M-token document — far beyond any
#: crawl page). ENFORCED since r6: a pathological document past the
#: bound would make (2^24-1-pos) negative and silently corrupt the
#: window-min key, so the pos projection raises instead — a WHEN on a
#: column already computed per row, no extra pass.
WINNOW_POSBITS = 16_777_216


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): over the document-order rolling k-token-gram
    hashes, slide a window of ``w`` consecutive positions and select
    the minimum hash per window (rightmost position on ties). The
    selected ~2/(w+1) of grams carry the guarantee that ANY verbatim
    span of >= w+k-1 tokens shared by two documents yields at least one
    shared selected fingerprint — the standard way to shrink an
    exact-substring index by 60%+ without losing long-span recall.

    Returns (doc, ng, spos, fp): selected 1-based gram position and its
    60-bit md5 fingerprint, plus the doc's total gram count ``ng``.

    Engine-portable determinism: the per-window argmin is computed as
    MIN over key = (fp mod 2^31-1)*2^24 + (2^24-1-pos) — a strict total
    order (pos is unique) that both Spark and DuckDB evaluate as exact
    BIGINT arithmetic; ties on the 31-bit selection hash resolve to the
    RIGHTMOST position, the classic winnowing rule. Documents shorter
    than ``w`` grams contribute their single clamped window (one
    selected fingerprint), so every doc with >= k tokens is
    represented.

    Scale: the window is PARTITIONED BY doc (no global sort); gram
    fan-out is one map-side explode behind a hash repartition; the
    decode-rejoin to recover the 60-bit fp is a keyed equi-join on
    (doc, pos). Linear in corpus gram volume.

    An Arrow twin (numpy sliding-window min per doc, parity-tested)
    was tried and REVERTED in r7 on measurement: interleaved A/B of
    dedup_winnowed_pairs at sf0.1 showed catalyst 2.12 s vs arrow
    2.14 s min-of-3 — the fingerprint stage is not where that query's
    time goes (the fp self-join + distinct dominate), and the share
    only shrinks at scale, so the second code path wasn't worth its
    maintenance. The minhash streaming kernel (minhash_band_rows_arrow)
    is the case where the same move DID pay.
    """
    from pyspark.sql import Window

    from stream_spark.operators.text import md5_long, normalize_text, tokens, word_ngrams_all

    par = cpu_partitions(df)
    # NOTE: do NOT carry size(gram_array) through the explode — project
    # collapsing rebuilds the whole inlined gram array (including the
    # tokenization regex) per OUTPUT row of the Generate, turning the
    # explode quadratic per doc (measured 70x at sf0.1). ng and the
    # full-window validity test are recovered from window functions
    # over the exploded rows instead.
    pb = F.lit(WINNOW_POSBITS)
    # guard: pos must fit the 24-bit field or the min-key arithmetic
    # silently corrupts — raise on the (already computed) column
    pos_raw = F.col("pos0") + 1
    pos_ok = F.when(pos_raw < pb, pos_raw).otherwise(
        F.raise_error(
            F.lit("winnow_fingerprints: document exceeds 2^24-1 grams (position encoding)")
        ).cast("int")
    )
    g = (
        df.select(
            F.col(id_col).alias("doc"),
            tokens(normalize_text(F.col(text_col))).alias("ws"),
        )
        .repartition(par, "doc")
        .select("doc", F.posexplode(word_ngrams_all(F.col("ws"), k)).alias("pos0", "g"))
        .select("doc", pos_ok.alias("pos"), md5_long(F.col("g")).alias("fp"))
    )
    key = (F.col("fp") % F.lit(MERSENNE31)) * pb + (pb - 1 - F.col("pos"))
    win = Window.partitionBy("doc").orderBy("pos").rowsBetween(0, w - 1)
    # pos is a valid window start iff its frame holds w rows (full
    # window) or it is pos 1 (the clamped short-doc window); ng is
    # max(pos) over the doc — same sort, no extra exchange.
    doc_all = Window.partitionBy("doc").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sel = (
        g.withColumn("mk", F.min(key.alias("key")).over(win))
        .withColumn("wcnt", F.count("*").over(win))
        .withColumn("ng", F.max("pos").over(doc_all))
        .filter((F.col("wcnt") == w) | (F.col("pos") == 1))
        .select("doc", "ng", (pb - 1 - F.col("mk") % pb).cast("int").alias("spos"))
        .distinct()
    )
    return sel.join(
        g.select("doc", F.col("pos").alias("spos"), "fp"), ["doc", "spos"]
    ).select("doc", "ng", "spos", "fp")




def incremental_verified_flags(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Incremental dedup with exact-Jaccard VERIFICATION (r8) — what a
    production ingest actually runs before discarding a document:
    ``incremental_dedup_flags`` answers "did any band collide?" (cheap,
    signature-level, false-positive-prone near the threshold); this
    operator verifies every band collision against the corpus's real
    shingle sets and reports the best verified match, so the drop
    decision is grounded in true similarity (the C85 verify-on-
    candidates discipline applied to the C35 incremental shape).

    Per NEW doc: (doc_id, is_dup, best_match, best_jaccard) — is_dup=1
    iff some corpus doc verifies at >= threshold; best_match is that
    doc (max jaccard, ties to the lowest corpus id), NULL otherwise.

    Scale: candidates come from the (band, bucket) equi-join of the
    batch index against the CORPUS index — per-bucket fan-out is
    bounded by the corpus's own near-dup density, which a maintained
    (deduplicated) corpus keeps small by construction; verification is
    |candidates| x shingles/doc keyed equi-joins, never a corpus
    self-join. At 100 TB the corpus band index and shingle table are
    precomputed stored artifacts; the daily batch joins against both.
    """
    from pyspark.sql import Window

    # ONE shingle pass per side (r11, the banded_jaccard_pairs
    # discipline): the exploded shingle index feeds the band-index
    # build AND the sizes AND the verify joins — unmaterialized, each
    # consumer re-ran tokenize+explode (7 documents scans in the
    # frozen plan; now 2, one per side). EAGER checkpoints: the three
    # consumers are parallel subtrees of one job, and a lazy pin lets
    # their stages race on the uncached RDD (measured worse than the
    # duplicate evaluation it removes); eager materializes once before
    # any consumer plans.
    # Per-side compact PROFILES (r12, the banded_jaccard_pairs
    # discipline): ONE aggregation per side yields the minhash
    # signature AND the doc's hashed shingle set (gh = md5_long(g) —
    # the signature's own base hash); the band index explodes from the
    # profile and verification joins each candidate to its two profile
    # rows and intersects the arrays in-row. Same values as the former
    # expand-by-shingles + count spelling ((doc, g) rows are distinct;
    # md5_long is the sanctioned hash, oracle rule 2), with the
    # |cand| × shingles/doc expanded frame, its aggregation, and both
    # sizes passes removed. EAGER pins, as before: the profile's
    # consumers (band explode + verify lookup) are parallel subtrees
    # of one job, and a lazy pin lets their stages race on the
    # uncached RDD (measured worse than the duplicate evaluation).
    shn = shingle_docs(new_df, text_col, id_col, n).select(
        "doc", md5_long(F.col("g")).alias("gh")
    )
    shc = shingle_docs(corpus_df, text_col, id_col, n).select(
        "doc", md5_long(F.col("g")).alias("gh")
    )
    profn = minhash_signatures(
        new_df, text_col, id_col, n, shingles=shn, keep_set=True
    ).localCheckpoint()
    profc = minhash_signatures(
        corpus_df, text_col, id_col, n, shingles=shc, keep_set=True
    ).localCheckpoint()
    nb = _explode_band_buckets(profn)
    cb = _explode_band_buckets(profc).select(F.col("doc").alias("cd"), "band", "bucket")
    cand = (
        nb.join(cb, ["band", "bucket"])
        .select(F.col("doc").alias("nd"), "cd")
        .distinct()
    )
    ver = (
        cand.join(
            profn.select(F.col("doc").alias("_dn"), F.col("gs").alias("_gsn")),
            F.col("nd") == F.col("_dn"),
        )
        .join(
            profc.select(F.col("doc").alias("_dc"), F.col("gs").alias("_gsc")),
            F.col("cd") == F.col("_dc"),
        )
        .withColumn("common", F.size(F.array_intersect(F.col("_gsn"), F.col("_gsc"))))
        .withColumn(
            "j",
            F.col("common")
            / (F.size(F.col("_gsn")) + F.size(F.col("_gsc")) - F.col("common")),
        )
        .filter(F.col("j") >= threshold)
        .select("nd", "cd", "j")
    )
    w = Window.partitionBy("nd").orderBy(F.desc("j"), F.asc("cd"))
    best = ver.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        new_df.select(id_col)
        .join(best, F.col(id_col) == F.col("nd"), "left")
        .select(
            id_col,
            F.when(F.col("nd").isNotNull(), 1).otherwise(0).cast("long").alias("is_dup"),
            F.col("cd").alias("best_match"),
            F.col("j").alias("best_jaccard"),
        )
    )
