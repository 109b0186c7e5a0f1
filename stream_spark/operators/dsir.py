"""DSIR importance-weight TRAINING for online application.

The deployment shape of hashed-n-gram importance sampling (Xie et al.
2023): weights are trained OFFLINE on a reference corpus (one batch
pass — `documents_dsir_selection` is the gated batch twin of this
arithmetic), then frozen and applied STATELESSLY to every incoming
document — a pure per-row Catalyst expression over a constant-folded
1024-entry literal map, so the streaming gate needs no state store
and no shuffle before its dashboard aggregate.

All arithmetic is the exact-integer scheme of the batch query:
Laplace bucket probabilities as scale-1e10 integers, per-bucket ratio
clipped at 1e9 (micro-scale 1000×), per-doc score = integer mean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.text import md5_long, normalize_text, tokens, word_ngrams_all

BUCKETS = 1024
SCALE10 = 10_000_000_000
CLIP = 1_000_000_000


def dsir_weight_map(
    docs: DataFrame, target: Column, buckets: int = BUCKETS
) -> tuple[dict[int, int], int]:
    """Train the bucket→weight table on ``docs`` (``target`` marks the
    target-domain rows). Returns (weights dict, default weight for
    buckets unseen in the reference corpus). The only collect is the
    ≤``buckets``-row weight table plus the 1-row totals — bounded
    metadata, the broadcast-table class."""
    bg = (
        docs.select(target.alias("is_t"), tokens(normalize_text(F.col("text"))).alias("ws"))
        .select("is_t", F.explode(word_ngrams_all(F.col("ws"), 2)).alias("g"))
        .select("is_t", (md5_long(F.col("g")) % F.lit(buckets)).alias("b"))
    )
    bu = bg.groupBy("b").agg(
        F.count("*").cast("long").alias("rb"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).cast("long").alias("tb"),
    ).collect()  # bounded: <= buckets rows
    t_total = sum(r["tb"] for r in bu)
    r_total = sum(r["rb"] for r in bu)

    def wgt(tb: int, rb: int) -> int:
        pt = (tb + 1) * SCALE10 // (t_total + buckets)
        pr = (rb + 1) * SCALE10 // (r_total + buckets)
        return min(pt * 1_000_000 // pr, CLIP)

    return {int(r["b"]): wgt(r["tb"], r["rb"]) for r in bu}, wgt(0, 0)


def dsir_score(
    text_col: Column, weights: dict[int, int], default: int, buckets: int = BUCKETS
) -> Column:
    """Per-row integer DSIR score (mean clipped micro-ratio over the
    doc's hashed bigrams; NULL for docs with < 2 tokens). Stateless:
    the weight map is a constant-folded literal, the fold is one
    Catalyst aggregate over the in-row bigram array — streaming-legal
    with no state."""
    m = F.create_map(*[F.lit(x) for kv in sorted(weights.items()) for x in kv])
    bigrams = word_ngrams_all(tokens(normalize_text(text_col)), 2)
    vals = F.transform(
        bigrams,
        lambda g: F.coalesce(
            F.element_at(m, md5_long(g) % F.lit(buckets)), F.lit(default)
        ),
    )
    total = F.aggregate(vals, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size(bigrams).cast("long")
    # exact integer DIV spelled as (total - total mod n) / n: every
    # step exact BIGINT, and the final division of an exact multiple
    # is a <2^53 quotient — no float-floor hazard (oracle rule 8)
    exact_div = ((total - F.pmod(total, n)) / n).cast("long")
    return F.when(F.size(bigrams) > 0, exact_div)


def dsir_score_rows(
    df: DataFrame,
    weights: dict[int, int],
    default: int,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("lang",),
    buckets: int = BUCKETS,
) -> DataFrame:
    """Arrow-batched stateless scorer — the HOT path for applying the
    frozen weight table (streaming-legal: mapInPandas with no state).

    `dsir_score` (the Catalyst-expression spelling above) is the
    executable spec, but Catalyst does not constant-fold a literal
    CreateMap referenced inside a higher-order-function lambda, so the
    1024-entry map is rebuilt per BIGRAM (~12 ms/doc measured — 60 s
    for 5k docs). A per-row lookup against a frozen table is exactly
    the case the guide reserves Pandas UDFs for; this replays the
    identical exact-integer arithmetic in Python ints (no float
    anywhere), pytest-asserted equal to the expression path row for
    row. Emits ``keep_cols`` + BIGINT ``score`` (docs with < 2 tokens
    are dropped, matching the expression path's NULL filter).
    """
    import hashlib

    from stream_spark.operators.text import normalized_tokens_py

    w = dict(weights)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            scores, keeps = [], {c: [] for c in keep_cols}
            for idx, text in enumerate(pdf[text_col]):
                # pinned to Spark semantics (trim ' ' only, ASCII \s) —
                # Python str.strip()/\s are Unicode-aware and diverge
                # on leading tabs / NBSP (see text.normalized_tokens_py)
                ws = normalized_tokens_py(str(text))
                if len(ws) < 2:
                    continue
                total = 0
                for a, b in zip(ws, ws[1:]):
                    h = int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16)
                    total += w.get(h % buckets, default)
                scores.append(total // (len(ws) - 1))
                for c in keep_cols:
                    keeps[c].append(pdf[c].iloc[idx])
            if scores:
                out = {c: keeps[c] for c in keep_cols}
                out["score"] = scores
                yield pd.DataFrame(out)

    types = dict(df.dtypes)
    schema = ", ".join(f"{c} {types[c]}" for c in keep_cols) + ", score long"
    return df.select(*keep_cols, text_col).mapInPandas(gen, schema)
