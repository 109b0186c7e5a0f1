"""Construction-metadata cache.

Several operators collect small DETERMINISTIC metadata from the input
at DataFrame-construction time — rownum's quantile boundaries and
per-bucket totals, the k-means centroid tables (deterministic seeds +
decimal-exact means), IVF cell assignments. Recomputing that metadata
on every construction of the same query over unchanged data is pure
waste: it is a pure function of (the logical plan, the bytes on disk).

``cached(df, tag, compute)`` memoizes such a computation keyed by the
CANONICALIZED optimized plan (expr ids normalized — captures
projections and filters), the input file state (path, size, mtime_ns
of every leaf file — any append, rewrite, or compaction changes the
key), and the caller's ``tag`` (operator signature: parameters that
change the metadata). Same class of cache as Spark's own shared
file-index/statistics caches; correctness requires only that the
computation be deterministic given the input data, which each caller
documents.

Only local files qualify (remote object stores have no cheap
driver-side mtime — those always recompute), only plans with ≤1024
leaf files (stat cost bound), and non-file-backed frames
(createDataFrame/range/checkpoints) never cache. LRU-bounded.
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict
from typing import Callable, TypeVar

from pyspark.sql import DataFrame

T = TypeVar("T")

_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_CACHE_MAX = 128


def cache_key(df: DataFrame, tag: tuple) -> tuple | None:
    """The (plan, file-state, tag) key, or None when the frame does not
    qualify (no files, too many files, non-local scheme, py4j error) —
    callers treat None as "always recompute"."""
    try:
        files = df.inputFiles()
        plan = df._jdf.queryExecution().optimizedPlan().canonicalized().treeString()
    except Exception:  # pragma: no cover — py4j/connect variance
        return None
    if not files or len(files) > 1024:
        return None
    h = hashlib.md5(plan.encode())
    for p in sorted(files):
        if not p.startswith("file:"):
            return None
        lp = p[len("file:"):]
        try:
            st = os.stat(lp)
        except OSError:
            return None
        h.update(f"{lp}|{st.st_size}|{st.st_mtime_ns}".encode())
    return (h.hexdigest(), tag)


def cached(df: DataFrame, tag: tuple, compute: Callable[[], T]) -> T:
    """Return ``compute()``, memoized under ``cache_key(df, tag)``.
    ``compute`` MUST be deterministic given the input data (the
    caller's contract); unkeyable frames recompute every time."""
    key = cache_key(df, tag)
    if key is not None and key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]  # type: ignore[return-value]
    value = compute()
    if key is not None:
        _CACHE[key] = value
        if len(_CACHE) > _CACHE_MAX:
            _CACHE.popitem(last=False)
    return value
