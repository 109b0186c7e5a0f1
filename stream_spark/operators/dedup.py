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
- simhash: pairs must share one of HAMMING_CHUNKS signature chunks
  (pigeonhole: ≤3 differing bits over 4 chunks ⇒ ≥1 equal chunk), so
  the join is an equi-join on chunks — exact, no cross join.
- embedding-cosine: exact decimal dot products; all-pairs only within
  LSH buckets at scale (see similarity.py); brute variant kept for
  small/verification use.

All hashes are md5-derived (see text.md5_long) so any engine can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.text import md5_long, normalize_text, tokens, word_ngrams

PERMS = 16
BAND_SIZE = 4
SIMHASH_BITS = 60
HAMMING_CHUNKS = 4  # 15 bits each


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
    par = df.sparkSession.sparkContext.defaultParallelism
    return toks.repartition(par, F.col("doc")).select(
        "doc", F.explode(word_ngrams(F.col("ws"), n)).alias("g")
    )


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


MERSENNE31 = 2_147_483_647


def perm_consts(p: int) -> tuple[int, int]:
    """Affine permutation constants for minhash p (shared with the SQL
    oracle): h_p = (a·h + b) mod 2^31-1."""
    a = (2_654_435_761 * (p + 1)) % MERSENNE31
    b = (40_503 * (p + 1) + 17) % MERSENNE31
    return a, b


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """PERMS min-hashes per doc.

    One md5 per shingle, then PERMS cheap affine permutations
    h_p = (a_p·h31 + b_p) mod 2^31-1 over the 31-bit base hash —
    ~PERMS× less hashing than md5-per-permutation, and a·h stays under
    2^62 so the arithmetic is exact BIGINT in any engine.
    """
    sh = shingle_docs(df, text_col, id_col, n).withColumn(
        "h31", md5_long(F.col("g")) % MERSENNE31
    )
    aggs = []
    for p in range(PERMS):
        a, b = perm_consts(p)
        aggs.append(F.min((F.lit(a) * F.col("h31") + F.lit(b)) % MERSENNE31).alias(f"mh{p}"))
    return sh.groupBy("doc").agg(*aggs)


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Candidate near-dup pairs: docs agreeing on any minhash band."""
    sigs = minhash_signatures(df, text_col, id_col, n)
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
    exploded = sigs.select("doc", F.explode(bands).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    return (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over distinct tokens of the normalized text.

    Bit j of the signature is the sign of Σ_tokens (±1) where the sign
    is bit j of the token's 60-bit md5 hash. Realized as an explode on
    bit position + two keyed aggregations — linear in tokens, no wide
    rows, shuffles only on (id, bit)."""
    toks = (
        df.select(
            F.col(id_col).alias("doc"),
            F.array_distinct(tokens(normalize_text(F.col(text_col)))).alias("ws"),
        )
        .repartition(df.sparkSession.sparkContext.defaultParallelism, F.col("doc"))
        .select("doc", F.explode(F.col("ws")).alias("w"))
        .withColumn("h", md5_long(F.col("w")))
    )
    bits = toks.select(
        "doc", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j")
    ).withColumn(
        # F.shiftright only takes a literal shift; the SQL form takes a column
        "contrib",
        F.expr("CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END"),
    )
    sums = bits.groupBy("doc", "j").agg(F.sum("contrib").alias("s"))
    return sums.groupBy("doc").agg(
        F.sum(F.expr("CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END")).alias("simhash")
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs with Hamming distance ≤ max_hamming, via chunk blocking.

    Exact for max_hamming < HAMMING_CHUNKS: a pair within distance d
    must agree on ≥1 of the 4 15-bit chunks (pigeonhole), so an
    equi-join on (chunk_idx, chunk_value) finds every qualifying pair.
    """
    sigs = simhash(df, text_col, id_col)
    chunk_bits = SIMHASH_BITS // HAMMING_CHUNKS
    chunks = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.shiftright(F.col("simhash"), c * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("v"),
                    )
                    for c in range(HAMMING_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    cand = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.c") == F.col("b.c")) & (F.col("a.v") == F.col("b.v")) & (F.col("a.doc") < F.col("b.doc")),
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
