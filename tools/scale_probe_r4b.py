"""Round-4b 10x scale probes: segment dedup, dup-span detection,
feature hashing, banded fuzzy pairs, ACF daily rollup, k-core.

Same replication method as tools/scale_probe_r4.py (shift surrogate
keys so per-key densities stay constant — note the replicated corpus
contains 10 IDENTICAL copies of every document, so the dedup probes do
10x the finding work, which is the realistic stress). Usage:

    python tools/scale_probe_r4b.py [workdir]
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
        "lineitem": ["l_orderkey", "l_partkey"],
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
    n = 0
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"| {name} | {best:.2f} s | rows={n} |")
    return best


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_scale_r4b"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("scale-probe-r4b")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, workdir)

    from dataflowex_spark.operators.dedup import fuzzy_pairs
    from dataflowex_spark.operators.graph import k_core
    from pyspark.sql import Window as W

    for label, d in (("1x", SF_DIR), ("10x", workdir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        li = spark.read.parquet(f"{d}/lineitem.parquet")

        def seg_dedup():
            tok = docs.select("doc_id", F.split("text", " ").alias("t"))
            nseg = F.ceil(F.size("t") / F.lit(10)).cast("int")
            segs = tok.select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), nseg - 1),
                        lambda i: F.array_join(F.slice("t", i * 10 + 1, 10), " "),
                    )
                ).alias("seg_idx", "seg"),
            )
            rn = F.row_number().over(
                W.partitionBy("seg").orderBy("doc_id", "seg_idx")
            )
            return (
                segs.withColumn("rn", rn)
                .groupBy("doc_id")
                .agg(F.sum((F.col("rn") > 1).cast("long")).alias("rm"))
                .count()
            )

        bench(f"segment_dedup {label}", seg_dedup)

        def dup_spans():
            tok = docs.select("doc_id", F.split("text", " ").alias("t"))
            n = F.size("t")
            grams = tok.filter(n >= 8).select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), (n - 8).cast("int")),
                        lambda i: F.array_join(F.slice("t", i + 1, 8), " "),
                    )
                ).alias("pos", "g"),
            )
            gw = W.partitionBy("g")
            marked = grams.select(
                "doc_id",
                "pos",
                (F.min("doc_id").over(gw) != F.max("doc_id").over(gw)).alias(
                    "x"
                ),
            )
            dw = W.partitionBy("doc_id").orderBy("pos")
            return (
                marked.filter("x")
                .withColumn("grp", F.col("pos") - F.row_number().over(dw))
                .groupBy("doc_id", "grp")
                .count()
                .groupBy("doc_id")
                .count()
                .count()
            )

        bench(f"dup_span_detection {label}", dup_spans)

        def hashing():
            words = docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("w")
            )
            h = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
            return (
                words.select("doc_id", (h % 64).alias("b"))
                .groupBy("doc_id", "b")
                .count()
                .count()
            )

        bench(f"feature_hashing {label}", hashing)

        bench(
            f"fuzzy_pairs(banded lev) {label}",
            lambda: fuzzy_pairs(docs).count(),
        )

        def acf_daily():
            return (
                li.groupBy(F.date_trunc("DAY", "l_shipdate").alias("d"))
                .agg(
                    F.floor(
                        F.sum(F.floor("l_extendedprice").cast("long")) / 1000.0
                    ).alias("r")
                )
                .count()
            )

        bench(f"acf_daily_rollup {label}", acf_daily)

        def kcore():
            a = li.filter(F.col("l_orderkey") % 10 == 0).select(
                "l_orderkey", "l_partkey"
            ).alias("a")
            b = li.filter(F.col("l_orderkey") % 10 == 0).select(
                "l_orderkey", "l_partkey"
            ).alias("b")
            edges = (
                a.join(b, "l_orderkey")
                .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
                .select(
                    F.col("a.l_partkey").alias("src"),
                    F.col("b.l_partkey").alias("dst"),
                )
                .distinct()
            )
            return k_core(edges, k=3).count()

        bench(f"k_core(k=3) {label}", kcore)


if __name__ == "__main__":
    main()
