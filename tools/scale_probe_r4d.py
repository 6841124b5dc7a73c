"""Round-4d 10x scale probes: bloom semi-join reduction and
prefix-filtered Jaccard.

Same replication method as tools/scale_probe_r4.py: surrogate keys
shift by copy (join densities stay constant: each replicated order
keeps exactly its own lineitems). The replicated corpus holds 10
IDENTICAL copies of every document, so the prefix-jaccard probe does
~100x the PAIR-FINDING work at 10x the data — the honest dedup
stress. Usage:

    python tools/scale_probe_r4d.py [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def replicate(spark, workdir: str) -> None:
    specs = {
        "documents": ["doc_id"],
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
    }
    for tbl, shifts in specs.items():
        out = f"{workdir}/{tbl}.parquet"
        if os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for col in shifts:
                df = df.withColumn(col, F.col(col) + F.lit(i * 10**9))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)


def bench(name, fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f} s ({n} rows)")
    return best


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x_r4d"
    spark = get_spark("scale-probe-r4d")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(workdir, exist_ok=True)
    replicate(spark, workdir)

    from dataflowex_spark.operators.bloom import bloom_build, bloom_prefilter
    from dataflowex_spark.operators.dedup import jaccard_prefix_pairs

    for label, d in [("1x", SF_DIR), ("10x", workdir)]:
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        hi = (
            spark.read.parquet(f"{d}/orders.parquet")
            .filter(F.col("o_totalprice") > 450000)
            .select("o_orderkey", "o_orderpriority")
        )
        docs = spark.read.parquet(f"{d}/documents.parquet")

        def bloom_joined():
            bf = bloom_build(hi, "o_orderkey", num_bits=1 << 21, num_hashes=5)
            pruned = bloom_prefilter(li, "l_orderkey", bf)
            return (
                pruned.join(hi, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .count()
                .count()
            )

        def plain_joined():
            return (
                li.join(hi, F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderpriority")
                .count()
                .count()
            )

        def prefix_pairs():
            return jaccard_prefix_pairs(
                docs, n=5, threshold=0.5, use_words=True
            ).count()

        bench(f"bloom_prune_join[{label}]", bloom_joined)
        bench(f"plain_join[{label}]", plain_joined)
        bench(f"prefix_jaccard[{label}]", prefix_pairs)

    spark.stop()


if __name__ == "__main__":
    main()
