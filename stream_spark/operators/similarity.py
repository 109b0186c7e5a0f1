"""Vector similarity: exact cosine, brute-force top-k, and
random-hyperplane LSH bucketing.

Cosine is computed with an exact-DECIMAL dot product (products of
doubles cast to DECIMAL(28,12), summed exactly) so results are
bit-identical regardless of accumulation order or engine — float sums
are not associative, decimal sums are.

Scale: brute-force top-k broadcasts the (small) query set over the
corpus — one scan, no shuffle of the corpus, a per-query top-k
aggregation. The LSH variant buckets both sides on hyperplane sign
bits so the join is an equi-join on bucket id — the 100 TB path.
Hyperplane weights are md5-derived (reproducible anywhere):
w(j,i) = ((md5_60bit(j:i) mod 2001) - 1000)/1000.0.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_spark.operators.rownum import cpu_partitions

N_PLANES = 4
DIM = 64


def _dec_sum(arr: Column) -> Column:
    """Exact sum of an array<double> via DECIMAL accumulation."""
    # accumulator precision must stay below Spark's 38 cap: a
    # (30,12)+(28,12) add yields (31,12) — full scale preserved — and
    # the cast back to (30,12) is exact for our magnitudes. (A (38,12)
    # accumulator would silently round every step to scale 11.)
    return F.aggregate(
        F.transform(arr, lambda x: x.cast("decimal(28,12)")),
        F.lit(0).cast("decimal(30,12)"),
        lambda acc, x: (acc + x).cast("decimal(30,12)"),
    )


# ---------------------------------------------------------------------------
# Arrow-side exact-decimal arithmetic: numpy fast paths that reproduce the
# Catalyst DECIMAL(28,12) fold bit-for-bit. Spark's double→decimal cast is
# BigDecimal.valueOf(d) = new BigDecimal(Double.toString(d)) — the SHORTEST
# round-trip representation (== Python repr) — then setScale(12, HALF_UP);
# Decimal.toDouble of the scale-12 sum is the correctly-rounded S/10^12
# (Java's fast path computes (double)S / 1e12 with S < 2^52 exact, the slow
# path parses the decimal string — both equal the correctly-rounded value).
# The vectorized path uses np.rint on S·10^12 and escapes any element whose
# scaled value sits near a half-integer boundary (where float multiply
# rounding or the repr-vs-binary gap could flip the rounding) to a scalar
# Decimal(repr(x)) — the exact JVM cast.
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

_Q12 = Decimal(1).scaleb(-12)


def _dec_q12(x: float) -> Decimal:
    """double → DECIMAL(·,12) exactly as Spark's cast (shortest-repr
    string, then HALF_UP at scale 12)."""
    return Decimal(repr(float(x))).quantize(_Q12, rounding=ROUND_HALF_UP)


def _dec_sum_products(xs, ys) -> Decimal:
    """Exact Σ decimal12(x·y) — the scalar spelling of the Catalyst
    ``dot`` fold, shared by every Arrow decimal-escape path."""
    tot = Decimal(0)
    for x, y in zip(xs, ys):
        tot += _dec_q12(float(x) * float(y))
    return tot


def _quantize12_int64(P):
    """Elementwise double → scale-12 integer (the unscaled value of
    Spark's DECIMAL(28,12) cast), vectorized. ``P`` float64 ndarray.

    Fast path: np.rint(P·1e12). An element is re-resolved with the
    scalar JVM-exact cast when its scaled value lies within a few ulps
    of a half-integer boundary — outside that margin the float rounding
    direction is unambiguous, so rint (half-to-even) and HALF_UP agree.
    The margin covers both the multiply rounding of P·1e12 and the
    shortest-repr-vs-binary gap (each < 1 ulp of the scaled value)."""
    import numpy as np

    Y = P * 1e12
    if Y.size and np.abs(Y).max() >= float(1 << 55):
        # 64-element row sums must stay < 2^61 (int64-safe with headroom);
        # |products| ≥ 2^55/1e12 ≈ 3.6e4 are outside this module's
        # embedding-magnitude contract.
        raise ValueError("vector magnitudes exceed the exact-decimal contract")
    N = np.rint(Y).astype(np.int64)
    frac = Y - np.floor(Y)
    margin = 8.0 * np.spacing(np.abs(Y)) + 1e-9
    esc = np.abs(frac - 0.5) <= margin
    if esc.any():
        flatP = P.ravel()
        flatN = N.ravel()
        for i in np.flatnonzero(esc.ravel()):
            flatN[i] = int(_dec_q12(float(flatP[i])).scaleb(12))
    return N


def _dec12_to_double(S):
    """Scale-12 integer sums (int64 ndarray) → the IEEE double of
    Spark's Decimal.toDouble: the correctly-rounded value of S/10^12."""
    import numpy as np

    if S.size == 0 or np.abs(S).max() < float(1 << 52):
        # float64(S) is exact below 2^53; one division by the exactly-
        # representable 1e12 is then correctly rounded.
        return S.astype(np.float64) / 1e12
    # int/int true division in Python is correctly rounded at any size
    return np.array([int(s) / 10**12 for s in S], dtype=np.float64)


def _exact_cosine_batch(Va, Vb):
    """Per-row exact cosine of two (n, dim) float64 matrices —
    bit-identical to the Catalyst ``cosine`` spelling
    dot/(norm·norm): exact-decimal dot and norms surfaced as doubles,
    then the same IEEE double division/multiplication order."""
    import numpy as np

    dots = _dec12_to_double(_quantize12_int64(Va * Vb).sum(axis=1))
    na = np.sqrt(_dec12_to_double(_quantize12_int64(Va * Va).sum(axis=1)))
    nb = np.sqrt(_dec12_to_double(_quantize12_int64(Vb * Vb).sum(axis=1)))
    return dots / (na * nb)


def _mean_partials_from_batch(V, idx, n_cells):
    """Exact per-cell partial sums for one Arrow batch of the Lloyd mean
    pass: ``V`` float64 (n, dim), ``idx`` int cell indices 0..n_cells-1.
    Each element is quantized exactly as Spark's double→DECIMAL(28,12)
    cast (``_quantize12_int64``); scaled-integer addition is exact and
    associative, so re-summing these partials downstream reproduces the
    Catalyst ``sum(cast(x as decimal(28,12)))`` aggregate bit-for-bit.
    Non-finite elements contribute 0 to the sums AND are excluded from
    the per-dimension counts — the former spelling shipped the vectors
    back across the Arrow boundary, where pandas→Arrow converts NaN to
    NULL (measured, r11), so ``count(x)`` in the posexplode aggregate
    skipped exactly these elements. Rows are chunked so no int64
    partial can overflow (never more than one chunk at embedding
    magnitudes). Yields (cells_present, (n_cells, dim) finite-element
    counts, (n_cells, dim) int64 psums) per chunk."""
    import numpy as np

    fin = np.isfinite(V)
    Vq = np.where(fin, V, 0.0)
    Q = _quantize12_int64(Vq)
    mx = int(np.abs(Q).max()) if Q.size else 0
    chunk = len(V) if mx == 0 else max(1, (1 << 62) // mx)
    for lo in range(0, len(V), chunk):
        sl = slice(lo, lo + chunk)
        Qc, ic, fc = Q[sl], idx[sl], fin[sl]
        acc = np.zeros((n_cells, V.shape[1]), dtype=np.int64)
        np.add.at(acc, ic, Qc)
        cnt = np.zeros((n_cells, V.shape[1]), dtype=np.int64)
        np.add.at(cnt, ic, fc.astype(np.int64))
        present = np.flatnonzero(np.bincount(ic, minlength=n_cells))
        yield present, cnt, acc


def exact_means_by_cell(partials: DataFrame) -> dict[int, list[float]]:
    """Finish the fused Lloyd mean pass: aggregate the per-batch scaled-
    integer partials (columns: cell grouping key ``cell``, per-dimension
    finite-element counts ``pcnt array<long>``, scale-12 sums
    ``psum array<long>``) with an exact Spark decimal SUM and surface
    per-dimension means bit-identical to the former posexplode spelling
    ``sum(cast(x as decimal(28,12))).cast("double") / count(x)`` over
    the Arrow-returned vectors: Decimal.toDouble is the correctly-
    rounded S/10^12 (Python int/int true division), then the same IEEE
    double-by-count division. Collect is bounded: ≤ n_cells rows — the
    centroid table."""
    rows = (
        partials.select("cell", F.posexplode(F.arrays_zip("psum", "pcnt")).alias("i", "z"))
        .groupBy("cell", "i")
        .agg(
            F.sum(F.col("z.psum").cast("decimal(38,0)")).alias("S"),
            F.sum("z.pcnt").alias("n"),
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("i", "S", "n"))).alias("sums"))
        .collect()  # bounded metadata: ≤ n_cells rows
    )
    return {
        int(r["cell"]): [(int(s["S"]) / 10**12) / int(s["n"]) for s in r["sums"]]
        for r in rows
    }


def dot(a: Column, b: Column) -> Column:
    return _dec_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))).cast("double")


def norm(a: Column) -> Column:
    return F.sqrt(_dec_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))).cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# --- SQL-text twins of the decimal folds (r10) -----------------------------
#
# Every functions-API higher-order call (zip_with/transform/aggregate)
# creates its lambdas through ~10 py4j round trips; a query that builds
# k×n_sub of these folds against literal centroids spends SECONDS of
# driver wall purely on lambda construction (profiled: 400 HOFs ≈ 5.2 s
# of ann_topk_ivfpq's construction). The SQL-text spellings below build
# the IDENTICAL expressions — same casts, same fold shapes, pinned by
# tests/test_ann.py::test_sql_text_folds_match_functions_api — in ONE
# F.expr parse per (or even spanning many) fold. Use them wherever a
# loop instantiates folds against driver-side literal vectors.


def sql_dvec(vals) -> str:
    """SQL literal array<double> for a float list. repr() round-trips
    exactly through Double.parseDouble, so CAST('<repr>' AS DOUBLE)
    reproduces each float bit-for-bit."""
    return "array(" + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) + ")"


def _dec_sum_sql(arr_sql: str) -> str:
    return (
        f"aggregate(transform({arr_sql}, v -> CAST(v AS DECIMAL(28,12))), "
        "CAST(0 AS DECIMAL(30,12)), (acc, x) -> CAST(acc + x AS DECIMAL(30,12)))"
    )


def dot_sql(a_sql: str, b_sql: str) -> str:
    z = f"zip_with({a_sql}, {b_sql}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
    return f"CAST({_dec_sum_sql(z)} AS DOUBLE)"


def norm_sql(a_sql: str) -> str:
    t = f"transform({a_sql}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"SQRT(CAST({_dec_sum_sql(t)} AS DOUBLE))"


def cosine_sql(a_sql: str, b_sql: str) -> str:
    return f"({dot_sql(a_sql, b_sql)} / ({norm_sql(a_sql)} * {norm_sql(b_sql)}))"


def cell_scores_expr(vec_col: str, cent_vecs: list[list[float]]) -> Column:
    """array<struct<c:cosine, nj:-cell>> of a vector column against
    every literal centroid — struct max = best cell. ONE parsed
    expression for all n_cells exact-decimal cosines (the functions-API
    loop paid ~3 HOF lambda constructions × n_cells in py4j round
    trips per query build)."""
    entries = [
        f"struct({cosine_sql(vec_col, sql_dvec(cw))} AS c, {-j} AS nj)"
        for j, cw in enumerate(cent_vecs)
    ]
    return F.expr("array(" + ", ".join(entries) + ")")


def _float_cosine(a: Column, b: Column) -> Column:
    """Fast double-fold cosine — used only as a prefilter."""
    fdot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fn = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(v, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, x: acc + x)
    )
    return fdot / (fn(a) * fn(b))


def _guarded_cosine(a: Column, b: Column, threshold: float) -> Column:
    """Two-phase cosine with the float prefilter INSIDE the expression:
    the exact decimal fold evaluates only where the cheap float cosine
    clears threshold−1e-6, NULL otherwise (any ``>= threshold`` filter
    drops NULL). The former two-chained-``.filter()`` spelling let
    Catalyst's CombineFilters + pushdown REORDER the conjunction — a
    downstream ``u != v`` filter pushing through put the decimal fold
    in front of the float prefilter and every candidate paid the
    decimal price (3-4× slower at sf1). A conditional inside one
    expression is reorder-proof: no optimizer rule splits a WHEN."""
    return F.when(_float_cosine(a, b) >= threshold - 1e-6, cosine(a, b))


def cosine_pairs(df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine ≥ threshold (brute; LSH-bucket at scale).

    Two-phase: a cheap double-arithmetic prefilter keeps pairs within
    1e-6 of the threshold, then the exact decimal cosine rescored on
    the survivors decides — identical results to a pure decimal pass
    (float error ≪ 1e-6) at a fraction of the decimal-fold work.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _guarded_cosine(F.col("va"), F.col("vb"), threshold))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_lsh(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold, all-pairs only WITHIN a
    random-hyperplane LSH bucket — the 100 TB path.

    The join is an equi-join on the bucket id (shuffle on bucket, pair
    volume Σ bucket²) instead of a corpus×corpus product. Bucketing is
    deterministic (md5-derived hyperplanes), so the recall loss vs the
    brute operator is a fixed, reproducible property: a pair straddling
    a hyperplane lands in different buckets and is not reported. Use
    fewer planes (bigger buckets) or multiple tables for higher recall;
    collision probability per plane is 1 - θ/π.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bk_a"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        lsh_bucket(F.col(vec_col), n_planes).alias("bk_b"),
    )
    return (
        a.join(b, (F.col("bk_a") == F.col("bk_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine", _guarded_cosine(F.col("va"), F.col("vb"), threshold))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


N_TABLES = 8
BAND_PLANES = 12


def banded_buckets(
    vec: Column | str,
    n_tables: int = N_TABLES,
    band_planes: int = BAND_PLANES,
    dim: int = DIM,
) -> Column:
    """Per-table hyperplane bucket ids: ``array<struct<t:int, bucket:
    long>>``, one entry per LSH table.

    Multi-table OR-construction (Indyk-Motwani / E2LSH banding, the
    same construction minhash banding uses in dedup.minhash_band_buckets):
    table ``t`` owns planes ``t·b .. t·b+b-1`` of the SAME md5-derived
    global family ``hyperplane_weights`` draws from, so the SQL oracle
    reproduces every bucket with the formula it already knows. Within a
    table the ``b`` sign bits AND together (bucket id = b-bit code →
    2^b buckets per table); across tables candidates OR (agree on ALL
    planes of ANY table). Per-plane collision is 1-θ/π, so pair recall
    is 1-(1-(1-θ/π)^b)^H — tune b for bucket granularity (pair volume
    Σ bucket² per table) and H for recall, independently. AND-only
    bucketing (lsh_bucket) couples them: that was the round-2 scale
    gap this replaces.
    """
    planes = hyperplane_weights(n_tables * band_planes, dim)
    if isinstance(vec, str):
        # SQL-text fast path (r10): one parse for all H·b sign-bit
        # folds instead of H·b py4j lambda constructions — parity with
        # the Column path pinned in tests/test_ann.py
        entries_sql = []
        for t in range(n_tables):
            bits = []
            for j in range(band_planes):
                z = (
                    f"zip_with({vec}, {sql_dvec(planes[t * band_planes + j])}, "
                    "(x, y) -> CAST(x AS DOUBLE) * y)"
                )
                bits.append(
                    f"(CASE WHEN CAST({_dec_sum_sql(z)} AS DOUBLE) >= 0 "
                    f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
                )
            entries_sql.append(
                f"struct({t} AS t, (CAST(0 AS BIGINT) + " + " + ".join(bits) + ") AS bucket)"
            )
        return F.expr("array(" + ", ".join(entries_sql) + ")")
    entries = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for j in range(band_planes):
            wcol = F.lit(list(planes[t * band_planes + j]))
            proj = _dec_sum(F.zip_with(vec, wcol, lambda x, y: x.cast("double") * y)).cast("double")
            bucket = bucket + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(0)
        entries.append(F.struct(F.lit(t).alias("t"), bucket.alias("bucket")))
    return F.array(*entries)


def embedding_mean(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension corpus mean as bounded driver metadata (dim
    doubles) — exact-decimal accumulation, one keyed agg."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg((F.sum(F.col("x").cast("decimal(28,12)")).cast("double") / F.count("x")).alias("m"))
        .collect()  # bounded metadata: dim rows
    )
    out = {int(r["i"]): float(r["m"]) for r in rows}
    return [out[i] for i in sorted(out)]


def banded_index(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    band_planes: int = BAND_PLANES,
    dim: int = DIM,
    center: list[float] | None = None,
) -> DataFrame:
    """(id, t, bucket) LSH index rows — the joinable form of
    ``banded_buckets``, computed as ONE numpy matmul per Arrow batch
    instead of H·b Catalyst decimal folds (which cost ~8 s per 2000
    vectors: 96 folds × 64 BigDecimal adds per row, far past codegen's
    comfort zone; the matmul is milliseconds and is the shape a real
    100 TB projection pass takes — map-only, no shuffle).

    Exactness is preserved by sign resolution: the float64 matmul
    decides each bucket bit, and any projection within 1e-6 of zero
    (float error is < 1e-10 here) is recomputed with per-product
    DECIMAL(28,12) quantization summed exactly, using ROUND_HALF_UP —
    the rounding of Spark's double→decimal cast — so every bit equals
    the all-decimal CATALYST fold's (``banded_buckets``; pytest
    test_ann asserts row-for-row equality). DuckDB's cast rounds
    HALF_EVEN instead, so on an exact scale-12 tie (representable in
    float32, e.g. 0.1983642578125) the oracle could theoretically
    disagree — a tie hazard shared by every decimal fold in this repo,
    Catalyst-vs-DuckDB, not introduced by this escape.

    ``center``: optional per-dimension mean (``embedding_mean``) to
    subtract before projecting. Sign-LSH assumes zero-centered data;
    on a half-space corpus (all-positive features — common for count
    or ReLU embeddings) planes with a large weight sum go constant-sign
    and collapse the bucket space (the adversarial case
    test_ann.test_banded_lsh_bucket_space documents). Centering
    restores balanced splits: projection of (x - μ) = x·w - μ·w, one
    precomputed offset per plane. Centered buckets are pytest-level
    (the gated oracle queries run uncentered — replaying μ in SQL is
    possible but the uncentered path is the oracle-parity one).
    """
    import numpy as np

    planes = np.array(hyperplane_weights(n_tables * band_planes, dim))
    weights = (1 << np.arange(band_planes)).astype(np.int64)
    offsets = (
        np.asarray(center, dtype=np.float64) @ planes.T
        if center is not None
        else np.zeros(n_tables * band_planes)
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            P = V @ planes.T - offsets  # (n, H*b) float64 projections
            near = np.abs(P) < 1e-6
            if center is not None:
                near = np.zeros_like(near)  # centered = pytest-level, no decimal escape
            if near.any():
                for r, c in zip(*np.where(near)):
                    s = int(_dec_sum_products(V[r], planes[c]).scaleb(12))
                    P[r, c] = 1.0 if s >= 0 else -1.0
            bits = (P >= 0).astype(np.int64)
            out = {"id": [], "t": [], "bucket": []}
            for t in range(n_tables):
                B = bits[:, t * band_planes : (t + 1) * band_planes] @ weights
                out["id"].append(ids)
                out["t"].append(np.full(len(ids), t, dtype=np.int32))
                out["bucket"].append(B)
            yield pd.DataFrame({k: np.concatenate(v) for k, v in out.items()})

    # repartition first: a single-split parquet would project the whole
    # corpus in one task otherwise (map-only either way)
    par = cpu_partitions(df)
    return (
        df.select(F.col(id_col).alias(id_col), F.col(vec_col))
        .repartition(par, F.col(id_col))
        .mapInPandas(gen, "id long, t int, bucket long")
    )


def cosine_pairs_lsh_banded(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    band_planes: int = BAND_PLANES,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ threshold via multi-table banded
    hyperplane LSH — the 100 TB embedding-dedup path.

    Shape: one (id, t, bucket) index row per table per vector (H rows),
    self-equi-join on (t, bucket), DISTINCT candidate ids, then the
    vectors join back by id and the Arrow kernel scores every candidate
    with the exact-decimal cosine and filters on the exact value
    (``score_pairs_arrow``). Pair volume is Σ_t Σ_bucket m² with
    2^band_planes buckets per table — at b=12 that's 4096 buckets/table
    versus the 16 total of the round-2 AND-only scheme, with recall
    bought back by the H-table OR. ``max_bucket_size`` drops
    pathological buckets (identical-vector swarms collide in EVERY
    table by construction — route those through exact dedup first),
    mirroring minhash_lsh_candidates' control.
    """
    cand = _banded_candidates(df, id_col, vec_col, n_tables, band_planes, max_bucket_size)
    return score_pairs_arrow(cand, df, threshold, id_col, vec_col)


def _banded_candidates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int,
    band_planes: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """Shared candidate generation for the banded-LSH pair/edge public
    functions (r7 ADVICE: two verbatim spellings of this logic could
    drift): banded index → optional hot-bucket cap → in-bucket
    self-join → distinct (OR across tables: a pair colliding in
    several tables scores once)."""
    # the banded index (a corpus-wide Arrow matmul) feeds both self-join
    # sides (+ the bucket-size cap) — materialize it once instead of
    # re-running the kernel per consuming subtree (r9, the
    # dedup._materialize_index pattern; measured on the text family at
    # 3-6x, same shape here)
    from stream_spark.operators.dedup import _materialize_index

    idx = _materialize_index(banded_index(df, id_col, vec_col, n_tables, band_planes))
    if max_bucket_size is not None:
        sizes = idx.groupBy("t", "bucket").agg(F.count("*").alias("_bsz"))
        idx = idx.join(sizes, ["t", "bucket"]).filter(F.col("_bsz") <= max_bucket_size)
    a, b_ = idx.alias("a"), idx.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def score_pairs_arrow(
    cand: DataFrame,
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    both_directions: bool = False,
) -> DataFrame:
    """Score (id_a, id_b) candidate pairs with the exact-decimal cosine
    in ONE numpy pass per Arrow batch — bit-identical to the Catalyst
    ``_guarded_cosine`` + filter spelling (pytest asserts equality on
    planted exact-tie corpora), at none of its interpreted-fold cost:
    the Catalyst DECIMAL(28,12) fold evaluates ~0.2 ms per candidate
    row interpreted, which made the banded-LSH consumers
    (embeddings_knn_graph / label_propagation at threshold −1, where
    EVERY candidate is scored) the two slowest queries in the engine.

    Vectors join to the candidate list by id (two keyed equi-joins —
    the index rows never carry vectors, so the LSH shuffle stays H×12
    bytes per row at any corpus size), then the kernel computes the
    exact cosine and applies the threshold on the EXACT value. With
    ``both_directions`` each surviving pair is emitted as two directed
    edge rows inside the kernel — consumers that rank per source node
    (k-NN graph) get both directions without a unionAll that would
    duplicate the whole candidate subtree in the plan (measured ~2×
    the full query cost at sf0.1 before this path existed)."""
    import numpy as np
    import pandas as pd

    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = cand.join(va, "id_a").join(vb, "id_b")

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Va = np.array([np.asarray(v, dtype=np.float64) for v in pdf["va"]])
            Vb = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vb"]])
            # Degenerate-norm contract + float prefilter, BOTH mirroring
            # the Catalyst _guarded_cosine spelling exactly (r7 ADVICE):
            #  1. a FLOAT-zero norm (true zero vector) raises — under
            #     ANSI mode Catalyst's float guard hits DIVIDE_BY_ZERO;
            #  2. pairs failing the float guard (fcos < threshold-1e-6)
            #     drop WITHOUT evaluating the exact path — this is what
            #     saves a tiny-vs-healthy pair from the decimal 0-norm
            #     (components < ~7.07e-7 square to < 5e-13 and quantize
            #     to 0 at scale 12) that the unguarded kernel tripped on;
            #  3. a guarded pair whose exact cosine is non-finite (its
            #     quantized norm collapsed to 0) raises, as Catalyst's
            #     exact division would.
            # Parity pinned by test_score_pairs_arrow_degenerate_norm_parity.
            fden = np.sqrt((Va * Va).sum(axis=1)) * np.sqrt((Vb * Vb).sum(axis=1))
            if (fden == 0).any():
                bad = int(pdf["id_a"].to_numpy()[fden == 0][0])
                raise ValueError(
                    f"zero-norm embedding in candidate pair (id_a={bad}): cosine is "
                    "undefined — filter degenerate vectors before pairing (the "
                    "Catalyst spelling raises DIVIDE_BY_ZERO on the same input)"
                )
            guard = ((Va * Vb).sum(axis=1) / fden) >= threshold - 1e-6
            cosv = np.full(len(pdf), -np.inf)
            if guard.any():
                with np.errstate(invalid="ignore", divide="ignore"):
                    cosv[guard] = _exact_cosine_batch(Va[guard], Vb[guard])
            nonfinite = guard & ~np.isfinite(cosv)
            if nonfinite.any():
                bad = int(pdf["id_a"].to_numpy()[nonfinite][0])
                raise ValueError(
                    f"degenerate quantized norm in candidate pair (id_a={bad}): "
                    "every squared component is below the 1e-12 decimal scale — "
                    "the exact-decimal cosine is undefined (Catalyst raises "
                    "DIVIDE_BY_ZERO on the same input)"
                )
            keep = guard & (cosv >= threshold)  # exact-value filter, same as Catalyst
            ia = pdf["id_a"].to_numpy()[keep]
            ib = pdf["id_b"].to_numpy()[keep]
            cv = cosv[keep]
            if both_directions:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate([ia, ib]),
                        "id_b": np.concatenate([ib, ia]),
                        "cosine": np.concatenate([cv, cv]),
                    }
                )
            else:
                yield pd.DataFrame({"id_a": ia, "id_b": ib, "cosine": cv})

    return joined.mapInPandas(gen, "id_a long, id_b long, cosine double")


def cosine_edges_lsh_banded(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    band_planes: int = BAND_PLANES,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Both directed edges of every ``cosine_pairs_lsh_banded`` pair:
    (vec_id, neighbor_id, cosine) — the k-NN-graph input shape, emitted
    by the scoring kernel itself so the plan holds ONE candidate
    subtree (a unionAll of the pairs frame with its swap recomputes the
    whole LSH index + joins twice)."""
    cand = _banded_candidates(df, id_col, vec_col, n_tables, band_planes, max_bucket_size)
    return score_pairs_arrow(
        cand, df, threshold, id_col, vec_col, both_directions=True
    ).select(
        F.col("id_a").alias("vec_id"), F.col("id_b").alias("neighbor_id"), "cosine"
    )


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Two-phase since r5: a BLAS float prerank (one numpy matmul per
    Arrow batch, LOCAL top-m per query within each batch — so the
    exchange carries n_batches·n_queries·m candidate rows, never the
    corpus) feeds a global top-m cut, and the exact decimal cosine
    rescored on that 2k-deep margin decides the final order (float
    error ~1e-13 cannot reorder across the margin; the r1-r4 Catalyst
    double-fold prerank spent ~0.9 s on 60k 64-element `aggregate`
    folds plus a corpus-sized window exchange for the same answer).
    Survivor rows carry their corpus vector out of the matmul stage, so
    the corpus is scanned exactly once. Queries are bounded metadata by
    the operator's contract (the ANN serving shape: few queries, huge
    corpus) — collected once and broadcast to executors.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    m = max(2 * k, k + 10)
    spark = queries.sparkSession

    def collect_queries() -> tuple[list[int], list[list[float]]]:
        rows = queries.select(id_col, vec_col).collect()  # bounded metadata: query set
        return (
            [int(r[id_col]) for r in rows],
            [[float(x) for x in r[vec_col]] for r in rows],
        )

    qids_l, qvecs_l = collect_queries()
    if not qids_l:
        empty = "query_id long, neighbor_id long, cosine double, rank int"
        return spark.createDataFrame([], empty)
    qids = np.array(qids_l, dtype=np.int64)
    qmat = np.array(qvecs_l, dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def prerank(it):
        ids, qm, qn = bq.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            cmat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (qm @ cmat.T) / (qn[:, None] * cnorm[None, :])  # (n_q, batch)
            nb = pdf[id_col].to_numpy(dtype=np.int64)
            top = min(m, sims.shape[1])
            # total order (fcos desc, neighbor_id asc) — the SAME order
            # the global survivor window uses, so the local cut commutes
            # with it and the survivor set is a pure function of the
            # data, never of Arrow batch boundaries. A bare argpartition
            # on fcos alone made tie survival (exact-duplicate swarms)
            # depend on file layout. lexsort: last key is primary.
            order = np.lexsort((np.broadcast_to(nb, sims.shape), -sims), axis=-1)
            part = order[:, :top]
            flat = part.ravel()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, top),
                    "neighbor_id": nb[flat],
                    "fcos": np.take_along_axis(sims, part, axis=1).ravel(),
                    "cv": list(cmat[flat]),
                }
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        prerank, schema="query_id long, neighbor_id long, fcos double, cv array<double>"
    )
    wpre = Window.partitionBy("query_id").orderBy(F.col("fcos").desc(), F.col("neighbor_id"))
    survivors = local.withColumn("prerank", F.row_number().over(wpre)).filter(
        F.col("prerank") <= m
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # broadcast-ok: q is the contract-bounded query set, not the corpus
    scored = survivors.join(F.broadcast(q), "query_id").withColumn(
        "cosine", cosine(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def incremental_embedding_flags(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental EMBEDDING dedup — the vector twin of
    dedup.incremental_dedup_flags: flag which NEW vectors share any
    banded-LSH (table, bucket) with the EXISTING corpus, without ever
    pairing the corpus against itself.

    The corpus collapses to its DISTINCT (t, bucket) index before the
    join (append-only at 100 TB — store it, join each batch, append
    the batch's rows), so each new band row meets at most one index
    row: structurally immune to hot buckets. Returns
    (id, is_dup 0/1) per new vector."""
    nb = new_df.select(
        F.col(id_col).alias("doc"), F.explode(banded_buckets(vec_col)).alias("tb")
    ).select("doc", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
    cb = (
        corpus_df.select(F.explode(banded_buckets(vec_col)).alias("tb"))
        .select(F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = nb.join(cb, ["t", "bucket"], "left")
    return joined.groupBy(F.col("doc").alias(id_col)).agg(
        F.max(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("is_dup")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors with a DIFFERENT label — the
    negatives that actually move an embedding model (high-similarity,
    wrong class), mined corpus-wide instead of in-batch.

    Same shape as ``topk_bruteforce`` (broadcast bounded query set over
    one corpus scan, float prerank → exact decimal rescore on a
    2k margin); the label-inequality filter runs before ranking so the
    k slots are all negatives. Scale path for unbounded query sets:
    bucket both sides with the banded LSH first, then rank within
    buckets — same composition as ann_topk_lsh."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), F.col(label_col).alias("ql")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), F.col(label_col).alias("cl")
    )
    # broadcast-ok: q is the contract-bounded query set, not the corpus
    pre = (
        # broadcast-ok: q is the contract-bounded query set, not the corpus
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("ql") != F.col("cl"))
        .withColumn("fcos", _float_cosine(F.col("qv"), F.col("cv")))
    )
    wpre = Window.partitionBy("query_id").orderBy(F.col("fcos").desc(), F.col("neighbor_id"))
    survivors = pre.withColumn("prerank", F.row_number().over(wpre)).filter(
        F.col("prerank") <= max(2 * k, k + 10)
    )
    scored = survivors.withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def range_search(
    queries: DataFrame,
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) pairs with cosine ≥ ``threshold`` —
    radius search, the thresholded sibling of ``topk_bruteforce``.

    Broadcast query set over ONE corpus scan: map-only, zero shuffles —
    each partition filters locally and only matches survive, so the
    output is bounded by the hit count, not the corpus. Same two-phase
    arithmetic as ``cosine_pairs``: float prefilter with 1e-6 margin,
    exact decimal rescore decides.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    return (
        # broadcast-ok: q is the contract-bounded query set, not the corpus
        F.broadcast(q)
        .crossJoin(c)
        .withColumn("cosine", _guarded_cosine(F.col("qv"), F.col("cv"), threshold))
        .filter(F.col("cosine") >= threshold)
        .select("query_id", "neighbor_id", "cosine")
    )


def hyperplane_weights(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic md5-derived hyperplanes (same formula as the SQL
    oracle: ((md5_60bit(j:i) % 2001) - 1000) / 1000.0)."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16)
            row.append(((h % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, n_planes: int = N_PLANES, dim: int = DIM) -> Column:
    """Bucket id = concatenated sign bits of hyperplane projections."""
    planes = hyperplane_weights(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for j, weights in enumerate(planes):
        wcol = F.lit(list(weights))  # one literal, not dim F.lit calls (r10)
        proj = _dec_sum(F.zip_with(vec, wcol, lambda x, y: x.cast("double") * y)).cast("double")
        bucket = bucket + F.when(proj >= 0, F.lit(1 << j).cast("long")).otherwise(0)
    return bucket


N_CELLS = 16
N_PROBE = 4


def assign_cell_two_phase(vec: Column, cent_vecs: list[list[float]]) -> Column:
    """Exact nearest-cell argmax with k× less decimal work: float
    cosines rank all cells (cheap double folds over an indexed literal
    centroid matrix), the exact DECIMAL cosine re-resolves only cells
    within 1e-6 of the float maximum (float error ≪ 1e-6 ⇒ the true
    decimal argmax is always among them). Ties to the lowest cell via
    the (cos, -cell) struct max — identical to the all-decimal
    formulation the SQL oracles replay. This is the corpus-side
    assignment path of the IVF family; query-side probing stays
    all-decimal (query sets are contract-bounded)."""
    from stream_spark.operators.dedup import _bind_once

    n = len(cent_vecs)
    cents_lit = F.lit([list(cv) for cv in cent_vecs])  # one nested literal (r10)
    # centroid float norms precomputed driver-side (same IEEE double
    # ops the JVM fold would run; prefilter-only so the 1e-6 margin
    # absorbs any ordering difference anyway)
    fnorms = [sum(w * w for w in cv) ** 0.5 for cv in cent_vecs]
    fnorms_lit = F.lit(fnorms)

    def _fdot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def inner(v: Column) -> Column:
        fnv = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

        def with_fnv(fn_v: Column) -> Column:
            fentries = F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda j: F.struct(
                    (
                        _fdot(v, F.element_at(cents_lit, (j + 1).cast("int")))
                        / (fn_v * F.element_at(fnorms_lit, (j + 1).cast("int")))
                    ).alias("fc"),
                    (-j).cast("int").alias("nj"),
                ),
            )

            def with_fe(fe: Column) -> Column:
                def with_fmax(fm: Column) -> Column:
                    cands = F.filter(fe, lambda e: e.getField("fc") >= fm - F.lit(1e-6))

                    def with_dnorm(dn_v: Column) -> Column:
                        best = F.array_max(
                            F.transform(
                                cands,
                                lambda e: F.struct(
                                    (
                                        dot(
                                            v,
                                            F.element_at(
                                                cents_lit, (-e.getField("nj") + 1).cast("int")
                                            ),
                                        )
                                        / (
                                            dn_v
                                            * norm(
                                                F.element_at(
                                                    cents_lit,
                                                    (-e.getField("nj") + 1).cast("int"),
                                                )
                                            )
                                        )
                                    ).alias("c"),
                                    e.getField("nj").alias("nj"),
                                ),
                            )
                        )
                        return (-best.getField("nj")).cast("int")

                    return _bind_once(norm(v), with_dnorm)

                return _bind_once(F.array_max(fe).getField("fc"), with_fmax)

            return _bind_once(fentries, with_fe)

        return _bind_once(fnv, with_fnv)

    return _bind_once(vec, inner)


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> list[list[float]]:
    """The IVF coarse-quantizer centroid table: seeds are the
    embeddings of the ``n_cells`` smallest corpus ids, optionally
    tightened by ``refine_iters`` Lloyd rounds (Arrow assignment +
    decimal-exact means; a cell that loses all members keeps its
    seed). Deterministic given the data — min-id seeds, exact-decimal
    means, lowest-cell ties. The seed collect and every refine round
    run at EVERY construction (bounded metadata jobs; no
    cross-construction memo). Returns [] for an empty corpus."""

    def compute() -> list[list[float]]:
        cents = (
            corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
            .orderBy("cid")
            .limit(n_cells)
            .collect()  # bounded metadata collect: n_cells rows by contract
        )
        cent_vecs = [[float(x) for x in r["cv"]] for r in cents]
        for _ in range(refine_iters):
            # fused Arrow pass (guide §2.3 — aggregate before you
            # shuffle): the same bit-parity assignment kernel, but each
            # batch emits per-cell EXACT scaled-integer partial sums
            # (~n_batches×n_cells tiny rows through the post-Python
            # exchange) instead of n assigned vectors posexploded to
            # n×dim rows through two keyed exchanges. Means are
            # bit-identical to the posexplode spelling by construction
            # (exact_means_by_cell; parity pytested).
            upd = exact_means_by_cell(
                _cell_mean_partials_arrow(corpus, cent_vecs, id_col, vec_col)
            )
            cent_vecs = [
                upd[j] if j in upd else cent_vecs[j] for j in range(len(cent_vecs))
            ]
        return cent_vecs

    return compute()


def topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate top-k: the corpus is partitioned into
    ``n_cells`` inverted lists around seed centroids; each query probes
    its ``n_probe`` nearest cells and ranks exactly within them.

    Centroids seed from the embeddings of the ``n_cells`` smallest
    corpus ids — deterministic, which keeps the operator
    SQL-oracle-expressible — and ``refine_iters`` Lloyd rounds
    (decimal-exact means, still oracle-expressible; a cell that loses
    all members keeps its seed) tighten the partition before
    assignment. Each round costs one map-only corpus scan + one
    (cell, dim) keyed agg; centroids stay driver-side bounded
    metadata, exactly the k-means loop in ``operators.clustering``.

    Scale shape: assignment is a per-row argmax against the broadcast
    centroid list — one corpus scan, NO shuffle; the probe join is an
    equi-join on cell id (corpus shuffled once on its cell, ~1/n_cells
    of the corpus per probe); the exact-decimal cosine keeps results
    bit-identical across engines and partitionings.
    """
    from pyspark.sql import Window

    cent_vecs = ivf_centroids(
        corpus, n_cells, id_col=id_col, vec_col=vec_col, refine_iters=refine_iters
    )
    if not cent_vecs:
        # empty corpus: no cells, no neighbors — a literal F.array() of
        # zero centroid entries is type VOID and fails analysis
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )

    assigned = assign_cells_arrow(
        corpus, cent_vecs, id_col, vec_col, id_out="neighbor_id", keep_vec=True, vec_out="cv"
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.slice(
                F.reverse(F.array_sort(cell_scores_expr(vec_col, cent_vecs))), 1, n_probe
            ).alias("top_cells"),
        )
        .select("query_id", "qv", F.explode("top_cells").alias("tc"))
        .select("query_id", "qv", (-F.col("tc.nj")).alias("cell"))
    )
    scored = (
        # broadcast-ok: probes is the contract-bounded query set × n_probe
        F.broadcast(probes)
        .join(assigned, "cell")
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within bucket."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), lsh_bucket(F.col(vec_col), n_planes).alias("bq")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), lsh_bucket(F.col(vec_col), n_planes).alias("bc")
    )
    scored = (
        # broadcast-ok: q is the contract-bounded query set, not the corpus
        F.broadcast(q)
        .join(c, F.col("bq") == F.col("bc"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cell_assign_kernel(cent_vecs: list[list[float]]):
    """The per-batch nearest-cell assignment kernel (V float64 (n,dim)
    → int32 cell ids) shared by ``assign_cells_arrow`` and
    ``pq.ivfpq_corpus_rows`` — ONE definition so the two-phase
    exactness contract (float matmul prerank, 1e-6 margin, exact-
    decimal re-resolution, ties → lowest cell) cannot drift between
    the flat-IVF and fused IVF-PQ index builds."""
    import math

    import numpy as np

    cents = np.array(cent_vecs, dtype=np.float64)
    # float norms with the same driver-side spelling assign_cell_two_phase uses
    cfn = np.array([sum(w * w for w in cv) ** 0.5 for cv in cent_vecs])
    # decimal centroid norms once per call (k of them, bounded)
    dnc = [math.sqrt(float(_dec_sum_products(cv, cv))) for cv in cent_vecs]

    def kernel(V):
        fnv = np.sqrt((V * V).sum(axis=1))
        FC = (V @ cents.T) / (fnv[:, None] * cfn[None, :])
        fmax = FC.max(axis=1)
        cand = FC >= (fmax[:, None] - 1e-6)
        cells = cand.argmax(axis=1).astype(np.int32)  # lowest candidate
        for r in np.where(cand.sum(axis=1) > 1)[0]:
            vrow = V[r]
            dnv = math.sqrt(float(_dec_sum_products(vrow, vrow)))
            best = None
            for j in np.where(cand[r])[0]:
                cosv = float(_dec_sum_products(vrow, cent_vecs[j])) / (dnv * dnc[j])
                key = (cosv, -int(j))  # ties → lowest cell
                if best is None or key > best[0]:
                    best = (key, int(j))
            cells[r] = best[1]
        return cells

    return kernel


def assign_cells_arrow(
    df: DataFrame,
    cent_vecs: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_out: str = "neighbor_id",
    keep_vec: bool = False,
    vec_out: str = "cv",
) -> DataFrame:
    """Corpus→cell assignment as ONE numpy matmul per Arrow batch —
    bit-identical to ``assign_cell_two_phase`` by the same two-phase
    contract: float cosines rank all cells, any cell within 1e-6 of the
    float maximum is re-resolved with the exact decimal cosine (per-
    product double→DECIMAL(28,12) HALF_UP quantization — Spark's cast —
    summed exactly, surfaced as IEEE double), ties to the LOWEST cell.
    Cells outside the 1e-6 margin can never win the decimal phase
    (float error ≪ 1e-6), so numpy-vs-JVM fold-order differences at the
    margin boundary are harmless — the same argument ``banded_index``
    documents. The Catalyst spelling costs ~n_cells decimal folds per
    row in interpreted HOF evaluation; the matmul is milliseconds per
    batch and is the map-only, shuffle-free shape a 100 TB assignment
    pass takes. pytest asserts row-for-row equality against the
    Catalyst path including planted exact-tie corpora.

    Output: (id_out, cell int) + optionally the vector as
    array<double> (float→double widening is exact, and every consumer
    casts per-element to double anyway)."""
    import numpy as np
    import pandas as pd

    kernel = cell_assign_kernel(cent_vecs)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells = kernel(V)
            out = {id_out: ids, "cell": cells}
            if keep_vec:
                out[vec_out] = list(V)
            yield pd.DataFrame(out)

    schema = f"{id_out} long, cell int" + (f", {vec_out} array<double>" if keep_vec else "")
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(gen, schema)


def _cell_mean_partials_arrow(
    df: DataFrame,
    cent_vecs: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The Lloyd refine round's corpus pass, fused: ``cell_assign_kernel``
    argmax (the pytested two-phase exactness contract) + per-batch exact
    partial means (``_mean_partials_from_batch``) in ONE ``mapInPandas``.
    Output is (cell int, cnt bigint, psum array<long>) — ~batches×cells
    rows; feed to ``exact_means_by_cell``."""
    import numpy as np
    import pandas as pd

    kernel = cell_assign_kernel(cent_vecs)
    n_cells = len(cent_vecs)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            cells = kernel(V)
            for present, cnt, acc in _mean_partials_from_batch(V, cells, n_cells):
                yield pd.DataFrame(
                    {
                        "cell": present.astype(np.int32),
                        "pcnt": [cnt[c].tolist() for c in present],
                        "psum": [acc[c].tolist() for c in present],
                    }
                )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, "cell int, pcnt array<long>, psum array<long>"
    )
