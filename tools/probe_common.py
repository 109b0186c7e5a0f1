"""Volume-axis helpers shared by scale_probe.py and stretch_probe.py.

A linearity probe normalizes wall time against the INTRINSIC work an
operator family enumerates (VERDICT r6 item 4); when two probes spell
the same axis independently they can drift apart silently (the r7
_banded_candidates incident, repeated for band_candidates in r8 —
ADVICE r8 item 4). One definition, imported by both.
"""

from __future__ import annotations


def band_candidate_volume(spark, sf_dir: str) -> int:
    """Distinct minhash band-candidate pairs over documents — the exact
    number of pairs the banded family VERIFIES (r8): the replacement
    axis for Σ freq², grown by band-bucket collisions only (an m-doc
    clique costs m²/2 once, not once per shared shingle)."""
    from stream_spark.operators.dedup import minhash_lsh_candidates
    from stream_spark.sources import load_table

    return minhash_lsh_candidates(load_table(spark, sf_dir, "documents")).count()
