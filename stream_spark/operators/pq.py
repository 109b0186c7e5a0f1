"""Product quantization (PQ) — the memory-bound half of large-scale
ANN (Jégou et al., "Product Quantization for Nearest Neighbor
Search"): each vector is split into ``n_sub`` subvectors, each encoded
as the id of its nearest subspace centroid, so a 64-float embedding
compresses to ``n_sub`` small codes and asymmetric distance against a
full-precision query is ``n_sub`` table lookups.

Spark realization keeps the whole thing oracle-expressible:

- codebooks are DETERMINISTIC: subspace centroids come from the
  ``k`` lowest-id corpus vectors (the same seeding contract as
  ``similarity.topk_ivf`` — bounded-metadata collect, k rows);
- assignment is a map-only scan: per (row, subspace) the argmin of the
  exact-DECIMAL squared L2 distance to each centroid, ties to the
  smaller code (min over (dist, code) structs — ALGEBRAIC, no window);
- asymmetric top-k joins the corpus codes against the query's
  per-(subspace, code) distance table (bounded: queries × n_sub × k
  rows) and sums exact decimals per (query, vector) — one equi-join
  and one keyed agg, never a full-precision corpus scan per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SUB = 8
K_CODES = 16


def _sq_dist_dec(a: Column, b: Column) -> Column:
    """Exact squared L2 distance: per-term (x-w)² quantized to
    DECIMAL(28,12) (both engines' cast), summed exactly."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x.cast("double") - y) * (x.cast("double") - y)).cast("decimal(28,12)")),
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    )


def _sq_dist_dec_sql(a_sql: str, b_sql: str) -> str:
    """SQL-text twin of ``_sq_dist_dec`` (same casts, same fold —
    parity pinned in tests/test_ann.py): one parser call instead of
    ~10 py4j lambda round trips per instantiation, which matters when
    the LUT loop builds n_sub×k of these against literal centroids."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> "
        "CAST((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) AS DECIMAL(28,12))), "
        "CAST(0 AS DECIMAL(30,12)), (acc, x) -> CAST(acc + x AS DECIMAL(30,12)))"
    )


def _lut_expr(vec_col: str, books, n_sub: int, k: int, sub: int) -> Column:
    """The whole per-query (sub, code) → exact-decimal distance table
    as ONE parsed expression: array of n_sub×k structs, each an
    ``_sq_dist_dec_sql`` fold of the query subvector against a literal
    codebook row. Built as SQL text because the functions-API spelling
    spent ~4 s of driver wall per construction on py4j lambda creation
    (128 folds × ~10 round trips — profiled r10)."""
    from stream_spark.operators.similarity import sql_dvec

    entries = [
        f"struct({s} AS sub, CAST({c} AS BIGINT) AS code, "
        f"{_sq_dist_dec_sql(f'slice({vec_col}, {s * sub + 1}, {sub})', sql_dvec(books[s][c]))} AS d)"
        for s in range(n_sub)
        for c in range(k)
    ]
    return F.expr("array(" + ", ".join(entries) + ")")


def _sq_dist_float(a: Column, b: Column) -> Column:
    """Fast double-fold squared L2 — prefilter only (error ~1e-13 rel)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_code(part: Column, books_lit: Column, k: int) -> Column:
    """Two-phase exact argmin over ``k`` codebook entries: float
    distances rank all codes (cheap double folds), the exact DECIMAL
    distance re-resolves only codes within 1e-9 of the float minimum
    (float error ≪ 1e-9, so the true decimal argmin is always among
    them — usually exactly one). Ties go to the smaller code via the
    (d, c) struct min, identical to the all-decimal formulation the
    SQL oracle replays — but ~k× less decimal work per row.

    Every stage is let-bound (``_bind_once``): HOF lambdas are
    interpreted and re-inline shared subexpressions at each use site,
    so without the bindings the float pass re-evaluates per filter
    element (measured slower than the all-decimal original)."""
    from stream_spark.operators.dedup import _bind_once

    def inner(p: Column) -> Column:
        fentries = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda c: F.struct(
                _sq_dist_float(p, F.element_at(books_lit, (c + 1).cast("int"))).alias("fd"),
                c.cast("long").alias("c"),
            ),
        )

        def with_fe(fe: Column) -> Column:
            def with_fmin(fm: Column) -> Column:
                cands = F.filter(fe, lambda e: e.getField("fd") <= fm + F.lit(1e-9))
                best = F.array_min(
                    F.transform(
                        cands,
                        lambda e: F.struct(
                            _sq_dist_dec(
                                p, F.element_at(books_lit, (e.getField("c") + 1).cast("int"))
                            ).alias("d"),
                            e.getField("c").alias("c"),
                        ),
                    )
                )
                return best.getField("c")

            return _bind_once(F.array_min(fe).getField("fd"), with_fmin)

        return _bind_once(fentries, with_fe)

    return _bind_once(part, inner)


def _codebooks(corpus: DataFrame, id_col: str, vec_col: str, n_sub: int, k: int, dim: int):
    """n_sub × k × (dim/n_sub) centroid floats from the k lowest-id
    corpus vectors (bounded metadata collect, run at every
    construction)."""

    def compute():
        rows = (
            corpus.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
            .orderBy("_i")
            .limit(k)
            .collect()  # bounded metadata: k seed rows by contract
        )
        sub = dim // n_sub
        return [
            [[float(r["_v"][s * sub + j]) for j in range(sub)] for r in rows]
            for s in range(n_sub)
        ]

    return compute()


def _code_entries(vec: Column, books, n_sub: int, k: int, dim: int) -> Column:
    """array<struct<sub,code>> PQ encoding expression for one vector —
    the shared spelling pq_codes and topk_ivfpq both project, so the
    IVF-PQ plan can fuse encoding with cell assignment in a single
    corpus scan instead of joining two separately-scanned frames."""
    sub = dim // n_sub
    entries = []
    for s in range(n_sub):
        part = F.slice(vec, s * sub + 1, sub)
        # one nested-array literal, not k*sub F.lit py4j round trips (r10)
        books_lit = F.lit([books[s][c] for c in range(k)])
        entries.append(
            F.struct(F.lit(s).alias("sub"), _argmin_code(part, books_lit, k).alias("code"))
        )
    return F.array(*entries)


def _clamped_k(books, k: int) -> int:
    """A corpus with 1..k-1 vectors seeds fewer than ``k`` codebook
    entries; clamp the effective code count so the LUT/encode loops
    (``books[s][c] for c in range(k)``) stay in range — the undersized
    sibling of the empty-corpus short-circuits."""
    if not books[0]:
        raise ValueError("corpus is empty — no PQ codebook seeds")
    return min(k, len(books[0]))


def pq_codes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    k: int = K_CODES,
    dim: int = 64,
) -> DataFrame:
    """(id, sub, code) PQ encoding of every corpus vector — map-only,
    exact-decimal argmin, ties to the smaller code."""
    books = _codebooks(corpus, id_col, vec_col, n_sub, k, dim)
    k = _clamped_k(books, k)
    return corpus.select(
        F.col(id_col).alias("id"),
        F.explode(_code_entries(F.col(vec_col), books, n_sub, k, dim)).alias("sc"),
    ).select("id", F.col("sc.sub").alias("sub"), F.col("sc.code").cast("long").alias("code"))


def topk_ivfpq(
    queries: DataFrame,
    corpus: DataFrame,
    topk: int,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    k: int = K_CODES,
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ — the composition production ANN systems actually run
    (FAISS IVFPQ; Jégou et al. §V): a coarse quantizer prunes the
    corpus to ``n_probe`` of ``n_cells`` inverted lists, and asymmetric
    PQ distance ranks only the codes in the probed cells. Per query the
    work is (corpus/n_cells)·n_probe code rows × n_sub LUT lookups —
    both the scan volume (IVF) and the per-vector cost (PQ) drop,
    which is why this shape scales to billions of vectors.

    Deterministic like its parts: cells seed from the n_cells
    lowest-id corpus vectors (cosine argmax, ties to lowest cell),
    codebooks from the k lowest-id vectors, distances exact-decimal —
    the SQL oracle replays coarse assignment, encoding, probing, and
    the LUT sum bit-for-bit. Scale shape: cell assignment + encoding
    are one map-only corpus scan; the probe is an equi-join on cell;
    the LUT is bounded (queries × n_sub × k) and broadcast."""
    from pyspark.sql import Window

    from stream_spark.operators.similarity import cell_scores_expr

    from stream_spark.operators.similarity import ivf_centroids

    cent_vecs = ivf_centroids(corpus, n_cells, id_col=id_col, vec_col=vec_col)
    if not cent_vecs:
        # empty corpus: a zero-entry F.array() of cell scores is type
        # VOID and fails analysis — short-circuit to an empty result
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adist double, rank long"
        )

    # Fused Arrow index build (r6): ONE numpy pass per batch computes
    # the coarse cell AND the 8 PQ codes — no second corpus scan, no
    # corpus-sized join, and unlike the Catalyst fusion of the same two
    # computations (tried and reverted: its giant projection
    # deoptimized wholestage codegen, 4.8-6.4 s vs 3.1-3.7 s split),
    # numpy has no codegen cliff. Bit-parity with the Catalyst
    # spellings is pytest-asserted including planted exact ties.
    cell_codes = ivfpq_corpus_rows(
        corpus, cent_vecs, id_col, vec_col, n_sub, k, dim
    )

    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.slice(
                F.reverse(F.array_sort(cell_scores_expr(vec_col, cent_vecs))), 1, n_probe
            ).alias("tc"),
        )
        .select("query_id", F.explode("tc").alias("t"))
        .select("query_id", (-F.col("t.nj")).alias("cell"))
    )

    books = _codebooks(corpus, id_col, vec_col, n_sub, k, dim)
    k = _clamped_k(books, k)  # 1..k-1-vector corpus: fewer codes, same math
    sub = dim // n_sub
    lut = queries.select(
        F.col(id_col).alias("query_id"), F.explode(_lut_expr(vec_col, books, n_sub, k, sub)).alias("e")
    ).select("query_id", F.col("e.sub").alias("sub"), F.col("e.code").alias("code"), F.col("e.d").alias("d"))

    scored = (
        # broadcast-ok: probes is the contract-bounded query set × n_probe
        cell_codes.join(F.broadcast(probes), "cell")
        # broadcast-ok: lut is the contract-bounded query set × n_sub × k
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("decimal(30,12)").alias("_ad"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_ad"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_ad").cast("double").alias("adist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def topk_pq(
    queries: DataFrame,
    corpus: DataFrame,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    k: int = K_CODES,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k: full-precision queries against PQ
    codes. Per query the (sub, code) → distance LUT is n_sub·k rows;
    the corpus side only ships its codes. Returns (query_id,
    neighbor_id, adist, rank) — adist is the approximate squared L2,
    exact-decimal so both engines rank identically."""
    from pyspark.sql import Window

    books = _codebooks(corpus, id_col, vec_col, n_sub, k, dim)
    if not books[0]:
        # empty corpus: no codebook seeds — indexing books[s][c] for the
        # LUT literals would IndexError; short-circuit to an empty result
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, adist double, rank long"
        )
    k = _clamped_k(books, k)  # 1..k-1-vector corpus: fewer codes, same math
    sub = dim // n_sub
    # Arrow encode (bit-parity pytested vs the Catalyst pq_codes spelling)
    codes = pq_codes_arrow(corpus, id_col, vec_col, n_sub, k, dim).withColumnRenamed("id", "neighbor_id")
    lut = queries.select(
        F.col(id_col).alias("query_id"), F.explode(_lut_expr(vec_col, books, n_sub, k, sub)).alias("e")
    ).select("query_id", F.col("e.sub").alias("sub"), F.col("e.code").alias("code"), F.col("e.d").alias("d"))
    scored = (
        # broadcast-ok: lut is the contract-bounded query set × n_sub × k
        codes.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d").cast("decimal(30,12)").alias("_ad"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_ad"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "neighbor_id",
            F.col("_ad").cast("double").alias("adist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _arrow_codes_for_batch(V, books_np, n_sub, sub):
    """Per-batch PQ codes via numpy two-phase argmin — the Arrow twin
    of ``_argmin_code`` under the identical exactness contract: float
    squared distances rank all codes, any code within 1e-9 of the float
    minimum is re-resolved with the exact decimal distance (per-term
    (x-w)² as IEEE double, quantized to DECIMAL(28,12) HALF_UP — the
    double→decimal cast Spark applies — summed exactly, compared AS
    DECIMAL), ties to the smaller code. Codes outside the 1e-9 margin
    can never win the decimal phase (float error ≪ 1e-9), so fold-order
    differences at the margin boundary are harmless. Returns an
    (n, n_sub) int64 code matrix."""
    import numpy as np
    from decimal import Decimal

    from stream_spark.operators.similarity import _dec_q12

    n = V.shape[0]
    codes = np.empty((n, n_sub), dtype=np.int64)
    for s in range(n_sub):
        Vs = V[:, s * sub : (s + 1) * sub]           # (n, sub)
        Bs = books_np[s]                              # (k, sub)
        D = ((Vs[:, None, :] - Bs[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        fmin = D.min(axis=1)
        cand = D <= (fmin[:, None] + 1e-9)
        codes[:, s] = cand.argmax(axis=1)             # lowest candidate
        for r in np.where(cand.sum(axis=1) > 1)[0]:
            best = None
            for c in np.where(cand[r])[0]:
                tot = Decimal(0)
                for x, w in zip(Vs[r], Bs[c]):
                    d = float(x) - float(w)
                    tot += _dec_q12(d * d)
                key = (tot, int(c))                   # decimal compare, ties → smaller code
                if best is None or key < best:
                    best = key
            codes[r, s] = best[1]
    return codes


def pq_codes_arrow(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    k: int = K_CODES,
    dim: int = 64,
) -> DataFrame:
    """(id, sub, code) PQ encoding via one numpy pass per Arrow batch —
    bit-identical to the Catalyst ``pq_codes`` spelling (pytest asserts
    equality including planted exact-tie codebooks; the oracle gate
    re-verifies against DuckDB). The Catalyst path pays n_sub×k
    interpreted decimal folds per row; this is the encode shape a real
    index build takes — map-only, BLAS-batched, no shuffle."""
    import numpy as np
    import pandas as pd

    books = _codebooks(corpus, id_col, vec_col, n_sub, k, dim)
    books_np = [np.array(b, dtype=np.float64) for b in books]
    sub = dim // n_sub

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            codes = _arrow_codes_for_batch(V, books_np, n_sub, sub)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_sub),
                    "sub": np.tile(np.arange(n_sub, dtype=np.int32), n),
                    "code": codes.reshape(-1),
                }
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, "id long, sub int, code long"
    )


def ivfpq_corpus_rows(
    corpus: DataFrame,
    cent_vecs: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    k: int = K_CODES,
    dim: int = 64,
) -> DataFrame:
    """Fused IVF-PQ corpus index build: ONE Arrow pass computes the
    coarse cell (``assign_cells_arrow`` arithmetic) AND the PQ codes
    per vector, emitting (neighbor_id, cell, sub, code) — no second
    corpus scan, no corpus-sized join, no giant Catalyst projection
    (the Catalyst fusion of the same two computations deoptimized
    wholestage codegen; numpy has no such cliff). Exactness contracts
    identical to ``assign_cell_two_phase`` + ``pq_codes`` (1e-6 / 1e-9
    margins, decimal escape, lowest-cell / smallest-code ties)."""
    import numpy as np
    import pandas as pd

    from stream_spark.operators.similarity import cell_assign_kernel

    books = _codebooks(corpus, id_col, vec_col, n_sub, k, dim)
    k = _clamped_k(books, k)  # clamp BEFORE any kernel sees k (r7 ADVICE:
    # the code kernel sizes its loops off books_np and ignored the raw
    # k only by accident; keep the invariant explicit)
    books_np = [np.array(b, dtype=np.float64) for b in books]
    sub = dim // n_sub
    assign = cell_assign_kernel(cent_vecs)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells = assign(V)
            codes = _arrow_codes_for_batch(V, books_np, n_sub, sub)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "neighbor_id": np.repeat(ids, n_sub),
                    "cell": np.repeat(cells, n_sub),
                    "sub": np.tile(np.arange(n_sub, dtype=np.int32), n),
                    "code": codes.reshape(-1),
                }
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, "neighbor_id long, cell int, sub int, code long"
    )
