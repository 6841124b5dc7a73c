"""Round-4e 10x scale probes: mleval statistics, distributed
covariance, KMV sketch.

Replication: events/embeddings get 10 copies with shifted surrogate
ids (event_id/vec_id/user_id shift by copy so distinct-user counts
scale 10x too). The probes check the claimed scale shapes:

- roc_auc / ks / psi: compacted-bucket statistics — wall should grow
  ~linearly with the SCAN, not with the ordered pass (bucket count is
  constant across scales by construction).
- covariance_matrix: partial X^T X — shuffle volume constant
  (#batches x d^2/2), wall ~linear in rows.
- kmv_jaccard: the two distinct() passes dominate; sketch algebra is
  constant-size.

Usage:  python tools/scale_probe_r4e.py [workdir]
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
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
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
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x_r4e"
    spark = get_spark("scale-probe-r4e")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(workdir, exist_ok=True)
    replicate(spark, workdir)

    from dataflowex_spark.operators.linalg import covariance_matrix
    from dataflowex_spark.operators.mleval import (
        ks_statistic,
        population_stability_index,
        roc_auc,
    )
    from dataflowex_spark.operators.similarity import kmv_jaccard

    for label, d in [("1x", SF_DIR), ("10x", workdir)]:
        ev = spark.read.parquet(f"{d}/events.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")

        bench(
            f"roc_auc[{label}]",
            lambda: roc_auc(
                ev,
                label=(F.col("event_type") == "purchase"),
                score=F.floor(F.col("value") * 100).cast("long"),
            ).count(),
        )
        bench(
            f"ks[{label}]",
            lambda: ks_statistic(
                ev.filter(F.col("event_type").isin("click", "view")),
                group=(F.col("event_type") == "click"),
                value=F.floor(F.col("value") * 100).cast("long"),
            ).count(),
        )
        bench(
            f"psi[{label}]",
            lambda: population_stability_index(
                ev.filter(F.col("event_type") == "view"),
                ev.filter(F.col("event_type") == "click"),
                value=F.floor(F.col("value") * 100).cast("long"),
            ).count(),
        )
        bench(
            f"covariance[{label}]",
            lambda: covariance_matrix(emb, "embedding").count(),
        )
        bench(
            f"kmv_jaccard[{label}]",
            lambda: kmv_jaccard(
                ev.filter(F.col("event_type") == "click"),
                ev.filter(F.col("event_type") == "purchase"),
                "user_id",
                k=256,
            ).count(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
