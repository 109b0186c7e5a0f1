"""Distributed exact PCA / whitening over an embedding column.

The tall-skinny shape (n rows × bounded dim d): ONE map-only pass
accumulates per-partition moment partials (count, Σx, Σxxᵀ) — no
shuffle at all — the driver combines the ≤ #partitions bounded
partials and runs the d×d eigendecomposition locally (d is the
embedding dimension, a model constant; d³ driver work is microseconds
against a 100 TB scan). Projection/whitening is a second map-only
Arrow matmul. This is how PCA is actually run at crawl scale — the
reduction is algebraic (moments are associative), so executors never
see each other's rows.

Determinism contract (pytest tier, like k-means/sketches — an
eigendecomposition is not SQL-expressible so there is no DuckDB
oracle): partials are float64-summed within a partition in row order
and combined on the driver in partition-id order, so results are
bit-stable for a fixed partitioning; component SIGN is canonicalized
(the largest-|weight| entry of each component is made positive), the
standard fix for eigh's sign ambiguity.

Reference scope: the flogo engine has no linear-algebra operators —
this extends SURVEY §2 block C (embedding pipeline: SemDeDup/IVF/PQ
all benefit from decorrelated, variance-ranked dimensions; whitening
is the OPQ-lite preprocessing for product quantization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moment_partials(df: DataFrame, vec_col: str):
    """One row per partition: (pid, n, sum[d], gram[d*d] row-major)."""
    def gen(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        g = None
        pid = -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if s is None:
                s = np.zeros(V.shape[1])
                g = np.zeros((V.shape[1], V.shape[1]))
            n += len(V)
            s += V.sum(axis=0)
            g += V.T @ V
        if n:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [list(s)], "g": [list(g.ravel())]}
            )

    return df.withColumn("_pid", F.spark_partition_id()).mapInPandas(
        gen, "pid int, n long, s array<double>, g array<double>"
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit top-``k`` principal components. Returns (mean, components
    (k×d, orthonormal rows, canonical sign), eigenvalues desc).

    The only collect is the bounded per-partition moment table
    (≤ #partitions rows of d+d² doubles — broadcast-ok-sized driver
    metadata, same class as the IVF centroid collects)."""
    import numpy as np

    rows = _moment_partials(df, vec_col).collect()  # bounded: one row/partition
    rows.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("pca_fit on an empty DataFrame")
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # (k, d)
    vals = np.maximum(vals[order], 0.0)
    for i in range(comps.shape[0]):           # canonical sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return [float(x) for x in mean], [[float(x) for x in row] for row in comps], [
        float(x) for x in vals
    ]


def pca_transform(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    eigenvalues: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Map-only Arrow projection: (x−μ)·Cᵀ, optionally scaled to unit
    variance per component (whitening — requires ``eigenvalues``)."""
    import numpy as np

    mu = np.asarray(mean, dtype=np.float64)
    C = np.asarray(components, dtype=np.float64)
    scale = None
    if whiten:
        if eigenvalues is None:
            raise ValueError("whiten=True needs eigenvalues")
        scale = 1.0 / np.sqrt(np.asarray(eigenvalues, dtype=np.float64) + eps)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            P = (V - mu) @ C.T
            if scale is not None:
                P = P * scale
            yield pd.DataFrame({id_col: pdf[id_col], out_col: [list(r) for r in P]})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} {id_type}, {out_col} array<double>"
    )
