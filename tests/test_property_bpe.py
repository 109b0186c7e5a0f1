"""Property-based BPE induction semantics: for arbitrary token
streams, the Catalyst pair-count/top-1/greedy-apply pipeline must
match a direct Python model — rule choice (count desc, pair asc) and
greedy left-to-right application (a fresh merge can't be the left side
of another merge in the same pass), and application must preserve the
flattened token sequence (space-join invariant).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TOK = st.sampled_from(["a", "b", "c", "ab"])
DOCS = st.lists(st.lists(TOK, min_size=0, max_size=8), min_size=1, max_size=5)


def _model_top(docs):
    counts = Counter()
    for toks in docs:
        counts.update(zip(toks, toks[1:]))
    if not counts:
        return None
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def _model_apply(toks, a, b, mm):
    out: list = []
    for t in toks:
        if out and out[-1] == a and t == b:
            out[-1] = mm
        else:
            out.append(t)
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=DOCS)
def test_bpe_round_matches_greedy_model(spark, docs):
    from stream_spark.operators.bpe import adjacent_pair_counts, apply_merge, top_merge

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "doc_id long, toks array<string>"
    )
    want = _model_top(docs)
    rule_rows = top_merge(adjacent_pair_counts(df)).collect()
    if want is None:
        assert rule_rows == []
        return
    (pair, cnt) = want
    assert (rule_rows[0]["a"], rule_rows[0]["b"], rule_rows[0]["pair_count"]) == (*pair, cnt)

    merged = {r["doc_id"]: list(r["toks"]) for r in apply_merge(df, top_merge(adjacent_pair_counts(df))).collect()}
    mm = f"{pair[0]} {pair[1]}"
    for i, toks in enumerate(docs):
        want_toks = _model_apply(toks, pair[0], pair[1], mm)
        assert merged[i] == want_toks
        # flattened-sequence invariant: merging never alters the stream
        assert " ".join(merged[i]) == " ".join(toks)
