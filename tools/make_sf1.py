"""Derive an sf1-scale probe dataset (10x sf0.1) under .scratch/sf1.

The driver ships sf{0.001,0.01,0.1}; the scale probe needs one more
decade. Rather than invent a new generator, replicate sf0.1 ten times
with key offsets — the standard scale-up shape (10x keys, same
distributions, referential integrity preserved by offsetting fact and
dimension keys in lockstep):

- events: event_id/user_id offset per replica (10x users, same time
  range -> 10x rows per window, the high-throughput shape).
- documents: doc_id offset; each replica's text gets a replica-suffix
  token so replicas are NEAR-duplicates (10-member near-dup clusters:
  a hard, realistic dedup workload) instead of exact copies.
- embeddings: vec_id offset, vectors unchanged (identical-vector
  swarms of 10 — the adversarial LSH case the bucket caps handle).
- orders/lineitem/customer/part/supplier: all keys offset in lockstep.
- nation/region: fixed-size, copied as-is (like TPC-H).

Everything is derived distributedly (no driver-side data) and
deterministically. Output: .scratch/sf1/<table>.parquet, ~10x sf0.1.

Run: python tools/make_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# key columns to offset, per table: {col: stride}
OFFSETS = {
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000},
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
}
COPY = ["nation", "region"]


def main() -> None:
    # defaults replicate sf0.1 -> sf1; the stretch probe rebases with
    #   python tools/make_sf1.py .scratch/sf3 --src=.scratch/sf1 \
    #       --replicas=3 --tag=s --stride-mult=10
    # (stride-mult keeps offset ranges disjoint when the source is
    # itself a replicated decade; tag keeps replica suffix tokens
    # distinct from the source's so clique structure is the designed
    # one, not accidental exact-dups).
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/root/repo/.scratch/sf1"
    src = SRC
    replicas = REPLICAS
    tag = "rep"
    stride_mult = 1
    for a in sys.argv[1:]:
        if a.startswith("--src="):
            src = a.split("=", 1)[1]
        elif a.startswith("--replicas="):
            replicas = int(a.split("=", 1)[1])
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--stride-mult="):
            stride_mult = int(a.split("=", 1)[1])
    from stream_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for table in COPY:
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: copied {df.count()} rows")

    for table, offs in OFFSETS.items():
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = []
        for k in range(replicas):
            d = base
            for col, stride in offs.items():
                d = d.withColumn(
                    col, (F.col(col) + F.lit(k * stride * stride_mult)).cast("long")
                )
            if table == "documents" and k > 0:
                # replica token -> near-dup (not exact-dup) clusters
                d = d.withColumn("text", F.concat(F.col("text"), F.lit(f" {tag}{k}")))
                d = d.withColumn("n_chars", F.length("text").cast("long"))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        n_files = max(4, min(32, replicas * 2))
        out.repartition(n_files).write.mode("overwrite").parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: {out.count()} rows ({replicas}x)")


if __name__ == "__main__":
    main()
