"""BPE-style merge-rule induction over a tokenized corpus —
distributed tokenizer training (Sennrich et al. 2016, word-level
variant: the merged unit is the space-joined phrase).

Each round is two corpus-linear steps, both JVM-side:

1. COUNT: explode adjacent token pairs (one generated row per
   position), one (a, b) keyed aggregate with map-side combine, global
   top-1 with a deterministic (count DESC, a, b) tie-break — the
   single bounded top-N exchange.
2. APPLY: the winning pair joins back as a 1-row broadcast (the
   DataFrame realization of a scalar subquery) and every document
   re-tokenizes via one Catalyst ``aggregate`` fold — greedy
   left-to-right, exactly BPE's application order: a just-merged unit
   cannot be the left side of another merge in the same pass unless it
   literally equals the rule's left token.

No driver round trip anywhere: the learned rules stay 1-row frames in
the plan. Scale: pair counting shuffles (a, b) keys — linear in corpus
tokens; the fold is O(tokens) per document with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def adjacent_pair_counts(toked: DataFrame, toks_col: str = "toks") -> DataFrame:
    """(a, b, pair_count) for every adjacent token pair occurrence."""
    toks = F.col(toks_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i.cast("int")).alias("a"),
            F.element_at(toks, (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        toked.select(F.explode(F.when(F.size(toks) >= 2, pairs).otherwise(F.array())).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("pair_count"))
    )


def top_merge(pair_counts: DataFrame) -> DataFrame:
    """The round's merge rule: 1-row frame (a, b, merged, pair_count),
    ties broken on (a, b) so every engine picks the same rule."""
    return (
        pair_counts.orderBy(F.col("pair_count").desc(), "a", "b")
        .limit(1)
        .select("a", "b", F.concat_ws(" ", "a", "b").alias("merged"), "pair_count")
    )


def apply_merge(toked: DataFrame, rule: DataFrame, toks_col: str = "toks") -> DataFrame:
    """Greedy left-to-right merge application, O(tokens) per document.

    Semantics are BPE's single pass: scan left to right, merge every
    (a, b) occurrence, and a just-created unit is never re-consumed by
    a later match in the same pass. Spelled as three linear steps
    instead of an ``aggregate`` fold (whose per-step accumulator concat
    copies the array — O(n²) per document):

    1. match flags — one '0'/'1' char per adjacent position;
    2. greedy non-overlapping selection — a left-to-right scan is
       exactly regexp_replace's left-to-right non-overlapping "11"→"10"
       (scanning resumes AFTER a replacement, so the right half of a
       taken match can't start another);
    3. rebuild — per position: taken(i-1) drops the token (consumed as
       a right half), taken(i) emits the merged unit, else passthrough.

    The selection arrays enter as HOF *arguments* (evaluated once per
    row); inside the lambdas only plain attributes are referenced —
    never re-derive a computed expression per element (Catalyst does
    not CSE inside lambda bodies; doing so re-ran the whole flag build
    per token, 7× slower than the fold it replaced).
    """
    toks = F.col(toks_col)

    # LEFT join against the ≤1-row rule: an EMPTY rule frame (corpus
    # with no 2-token document) leaves a/b/merged NULL, the match
    # predicate evaluates NULL → '0', and every document passes
    # through unchanged instead of being dropped by an inner join
    out = toked.withColumn("_one", F.lit(1)).join(
        F.broadcast(rule.withColumn("_one", F.lit(1))), "_one", "left"  # broadcast-ok: 1-row top-1 aggregate
    )
    n = F.size(toks)
    flags = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.when(
                (F.element_at(toks, i.cast("int")) == F.col("a"))
                & (F.element_at(toks, (i + 1).cast("int")) == F.col("b")),
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
    )
    taken = F.regexp_replace(flags, "11", "10")
    # shifted char views over positions 1..n (split() keeps a trailing
    # "" under limit -1 — the junk element is guarded in the lambda)
    prevs = F.split(F.concat(F.lit("0"), taken), "")  # [taken(i-1)]
    takes = F.split(F.concat(taken, F.lit("0")), "")  # [taken(i)]
    marks = F.zip_with(prevs, takes, lambda p, q: F.struct(p.alias("p"), q.alias("q")))
    folded_core = F.filter(
        F.transform(
            marks,
            lambda m, i: F.when(m["p"] == "", F.lit(None))  # split()'s trailing junk
            .when(m["p"] == "1", F.lit(None))  # consumed as the right half of a merge
            .when(m["q"] == "1", F.col("merged"))
            .otherwise(F.element_at(toks, (i + 1).cast("int"))),
        ),
        lambda x: x.isNotNull(),
    )
    # <2 tokens: nothing can merge (and the flag machinery would index
    # out of bounds under ANSI) — passthrough; NULL toks stay NULL
    folded = (
        F.when(n >= 2, folded_core)
        .when(n >= 0, toks)
        .otherwise(F.lit(None).cast("array<string>"))
    )
    return out.withColumn(toks_col, folded).drop("a", "b", "merged", "pair_count", "_one")


def bpe_apply_rounds(
    toked: DataFrame, rounds: int = 3, toks_col: str = "toks"
) -> DataFrame:
    """ENCODE with the induced tokenizer: learn ``rounds`` merge rules
    exactly as ``bpe_merge_rounds`` does and return the corpus with
    every rule applied (the train→apply pair). Same per-round
    checkpoint discipline; the output frame carries the final
    ``toks_col``."""
    cur = toked
    for r in range(1, rounds + 1):
        rule = top_merge(adjacent_pair_counts(cur, toks_col))
        cur = apply_merge(cur, rule, toks_col)
        if r < rounds:
            cur = cur.localCheckpoint()
    return cur


def bpe_merge_rounds(
    toked: DataFrame, rounds: int = 3, toks_col: str = "toks"
) -> DataFrame:
    """Learn ``rounds`` merge rules, applying each before counting the
    next. Returns (round, tok_a, tok_b, pair_count) — the merge table
    IS the induced tokenizer."""
    outs = []
    cur = toked
    for r in range(1, rounds + 1):
        # pin the 1-row rule: it has TWO consumers (the apply fold's
        # broadcast AND the output union), and without the pin the
        # output side re-runs the round's whole pair-count pass over
        # the corpus at collection time (r11 A/B: one count-pass per
        # round saved; the checkpoint itself is one row)
        rule = top_merge(adjacent_pair_counts(cur, toks_col)).localCheckpoint()
        outs.append(
            rule.select(
                F.lit(r).cast("bigint").alias("round"),
                F.col("a").alias("tok_a"),
                F.col("b").alias("tok_b"),
                F.col("pair_count").cast("bigint").alias("pair_count"),
            )
        )
        if r < rounds:
            # checkpoint per round (same discipline as components /
            # pagerank): truncates the growing fold lineage so round r
            # never re-runs rounds < r, and each pair-count shuffle
            # reads materialized token arrays instead of a re-derivation
            cur = apply_merge(cur, rule, toks_col).localCheckpoint()
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
