"""Binary-file ingestion and export — the multimodal I/O path.

Real multimodal corpora arrive as object-store files (images, audio,
video); Spark's ``binaryFile`` source reads them as (path, length,
content) rows with content as an opaque ``binary`` column — exactly
the payload shape ``operators.multimodal`` processes. Export goes the
other way: one file per row, written from the executors via
Arrow-batched ``mapInPandas`` (each partition writes its own files —
no driver collect, scales with the corpus).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_binary_files(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    ext: str = "bin",
) -> int:
    """Write one ``<id>.<ext>`` file per row from the executors;
    returns the number of files written. On a cluster ``out_dir`` must
    be shared storage (object store / NFS)."""
    os.makedirs(out_dir, exist_ok=True)

    def writer(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in it:
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                with open(os.path.join(out_dir, f"{i}.{ext}"), "wb") as f:
                    f.write(bytes(p))
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    counts = df.select(id_col, payload_col).mapInPandas(writer, "n long").collect()
    return sum(r["n"] for r in counts)


def read_binary_files(
    spark: SparkSession, in_dir: str, id_from_name: bool = True, glob: str = "*.bin"
) -> DataFrame:
    """Read a directory of binary files as (doc_id, payload, byte_len)
    via the ``binaryFile`` source (predicate pushdown on path/length
    works; content loads lazily per matched file)."""
    df = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(in_dir)
    out = df.select(
        F.col("content").alias("payload"), F.col("length").cast("long").alias("byte_len"), "path"
    )
    if id_from_name:
        out = out.withColumn(
            "doc_id", F.regexp_extract(F.col("path"), r"([0-9]+)\.[^./]+$", 1).cast("long")
        )
    return out.drop("path")
