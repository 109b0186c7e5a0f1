"""Registry invariants the rest of the harness relies on."""

from __future__ import annotations

import re

from stream_spark.queries import ORACLES, QUERIES


#: the ONLY queries allowed to ship without a DuckDB oracle — each
#: needs a documented reason and a dedicated pytest correctness tier.
NON_SQL_ORACLE = {
    # eigendecomposition is not SQL-expressible; contract-tested
    # against single-machine numpy PCA in tests/test_pca.py
    "embeddings_pca_project",
}


def test_every_query_has_an_oracle():
    """The all-oracled property: no rows-only fallbacks. A new query
    without a DuckDB oracle fails here before it weakens the gate —
    unless it is in the documented NON_SQL_ORACLE exemption list."""
    assert set(ORACLES) == set(QUERIES) - NON_SQL_ORACLE
    assert len(QUERIES) >= 123


def test_names_and_oracles_wellformed():
    for name, sql in ORACLES.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_public_api_exports_resolve():
    """Every name in stream_spark.__all__ must import and be callable
    or a class — the curated API is a contract, not a wish list."""
    import stream_spark as ss

    for name in ss.__all__:
        obj = getattr(ss, name)
        assert callable(obj) or isinstance(obj, type), name
