"""Round-4 10x scale probes: chunking, co-occurrence, bigram LM,
triangle counting, and the stop-gram candidate bound.

Same replication method as tools/scale_probe.py (shift surrogate keys
so per-key densities stay constant; growth then measures the
operator). Usage:

    python tools/scale_probe_r4.py [workdir]
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
        "documents": [("doc_id", False)],
        # shift BOTH keys: same per-order co-occurrence, 10x nodes/edges
        "lineitem": [("l_orderkey", False), ("l_partkey", False)],
    }
    for tbl, shifts in specs.items():
        out = f"{workdir}/{tbl}.parquet"
        if os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        parts = []
        for i in range(COPIES):
            df = base
            for col, _ in shifts:
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
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_scale_r4"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("scale-probe-r4")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, workdir)

    from dataflowex_spark.operators.graph import triangle_count
    from dataflowex_spark.operators.text import chunk_tokens
    from dataflowex_spark import queries as Q

    for label, d in (("1x", SF_DIR), ("10x", workdir)):
        docs = spark.read.parquet(f"{d}/documents.parquet")
        li = spark.read.parquet(f"{d}/lineitem.parquet")

        bench(
            f"chunk_tokens(docs, 32/8) {label}",
            lambda: chunk_tokens(docs, chunk=32, overlap=8).count(),
        )

        def cooccur():
            # q168 core on this corpus (bypass Catalog fixture paths)
            from dataflowex_spark.functions.text import bind, tokens as tok

            def pairs_of(ts):
                n = F.size(ts)

                def offset_pairs(dd):
                    m = F.greatest(n - dd, F.lit(0))
                    return F.zip_with(
                        F.slice(ts, 1, m),
                        F.slice(ts, 1 + dd, m),
                        lambda x, y: F.concat(
                            F.least(x, y), F.lit(" "), F.greatest(x, y)
                        ),
                    )

                return F.flatten(
                    F.array(offset_pairs(1), offset_pairs(2), offset_pairs(3))
                )

            return (
                docs.select(
                    F.explode(bind(tok(F.col("text")), pairs_of)).alias("p")
                )
                .groupBy("p")
                .agg(F.count("*").alias("n"))
                .orderBy(F.col("n").desc(), F.col("p"))
                .limit(40)
                .count()
            )

        bench(f"skipgram_cooccur top-40 {label}", cooccur)

        def edges():
            a = li.select("l_orderkey", "l_partkey").alias("a")
            b = li.select("l_orderkey", "l_partkey").alias("b")
            return (
                a.join(b, "l_orderkey")
                .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
                .select(
                    F.col("a.l_partkey").alias("src"),
                    F.col("b.l_partkey").alias("dst"),
                )
            )

        bench(
            f"triangle_count(co-purchase) {label}",
            lambda: triangle_count(edges()).collect()[0].n_triangles,
        )

    # stop-gram guard: boilerplate-heavy corpus where EVERY doc shares
    # one sentence — the raw inverted-index self-join pairs everything
    # with everything through it; max_gram_df prunes those candidates
    from dataflowex_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved contact support for details"
    for label, n_docs in (("5k docs", 5_000), ("50k docs", 50_000)):
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("document body "),
                F.col("id").cast("string"),
                F.lit(" unique tokens "),
                (F.col("id") * 7919 % 104729).cast("string"),
                F.lit(" " + boiler),
            ).alias("text"),
        )
        bench(
            f"ngram_jaccard max_gram_df=50 {label}",
            lambda: ngram_jaccard_pairs(
                base, n=3, threshold=0.1, max_gram_df=50
            ).count(),
            runs=1,
        )
        if n_docs <= 5_000:  # raw quadratic: only probe the small size
            bench(
                f"ngram_jaccard RAW (quadratic) {label}",
                lambda: ngram_jaccard_pairs(base, n=3, threshold=0.1).count(),
                runs=1,
            )


if __name__ == "__main__":
    main()
