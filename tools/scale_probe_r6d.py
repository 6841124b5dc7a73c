"""Round-6d decade probes: AQP sampling, IBLT reconciliation, golden
records, session pattern matching, ALS, SCC summary-graph pipeline.

Claimed scale shapes under test (1× = sf0.1, 10× = the replicated
schema from tools/make_scaled_schema.py):

- q372 AQP (approx_sum_ci): the sample predicate is one md5 compare
  at the scan, so the APPROXIMATE path's joins/aggregates touch ~1/10
  of the rows — the estimate pipeline should grow visibly slower than
  the exact one as the join cost starts to dominate the scan.
- q375 IBLT: build = 3-way explode + 256-cell aggregate per side —
  linear in keys with a CONSTANT shuffle (256 cells); the decode is
  flat (bounded by the sketch). Compared against the EXCEPT-shaped
  anti-join truth, which shuffles both key sets.
- q371 golden records: per-rule hash aggregates keyed by entity —
  linear.
- q377 session patterns: one user-keyed sessionization shuffle +
  scan-local regexes — linear.
- q374 ALS shape: ratings shuffle twice per sweep; entity count grows
  10× (users replicate), rank×rank solves stay constant-size.
- q369 SCC: the fact join reduces to 25 nations FIRST; the graph
  algorithm is size-independent (driver-side under the hybrid
  cutover), so the probe should track the join cost alone.

Usage: python tools/scale_probe_r6d.py [scaled_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def aqp_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.operators.sampling import approx_sum_ci

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_nationkey").alias("nation"),
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    t_est, _ = timed(
        lambda: approx_sum_ci(
            joined, ["nation"], "cents", "o_orderkey", buckets=10
        ).collect()
    )
    t_exact, _ = timed(
        lambda: joined.groupBy("nation")
        .agg(F.sum("cents").alias("exact"))
        .collect()
    )
    # the layout-backed variant: persist orders PARTITIONED BY the
    # sample bucket (one-time cost), so the sample predicate becomes
    # a partition filter and the scan skips 9/10 of the bytes — the
    # form that actually wins wall-clock at I/O-bound scale
    import tempfile

    from dataflowex_spark.operators.sampling import portable_bucket

    root = tempfile.mkdtemp(prefix="aqp_layout_")
    orders.withColumn(
        "smp", portable_bucket(F.col("o_orderkey"), 10)
    ).write.partitionBy("smp").mode("overwrite").parquet(root)
    bucketed = spark.read.parquet(root)

    def est_pruned():
        j = (
            bucketed.filter(F.col("smp") == 0)
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("c_nationkey").alias("nation"))
            .agg(
                (F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long")
                ) * 10).alias("est")
            )
        )
        return j.collect()

    t_pruned, _ = timed(est_pruned)
    return {
        "est_s": round(t_est, 1),
        "exact_s": round(t_exact, 1),
        "est_pruned_s": round(t_pruned, 1),
    }


def iblt_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.operators.reconcile import iblt_diff

    a = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k")
    )
    b = a.filter(F.col("k") % 99991 != 7)
    t_iblt, diff = timed(lambda: iblt_diff(a, b, "k", cells=512))
    t_anti, n = timed(
        lambda: a.join(b, "k", "left_anti")
        .unionByName(b.join(a, "k", "left_anti"))
        .count()
    )
    assert len(diff) == n, (len(diff), n)
    return {
        "iblt_s": round(t_iblt, 1),
        "anti_s": round(t_anti, 1),
        "diff": n,
    }


def golden_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.operators.linkage import golden_records

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("entity"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal"),
    )
    recs = (
        c.withColumn("priority", F.lit(1))
        .unionByName(
            c.withColumn("name", F.lower("name")).withColumn(
                "priority", F.lit(2)
            )
        )
    )
    t, n = timed(
        lambda: golden_records(
            recs, "entity", first_non_null=["name"], mode=["segment"],
            maximum=["bal"],
        ).count()
    )
    return {"s": round(t, 1), "entities": n}


def pattern_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.catalog import Catalog
    from dataflowex_spark.operators.windows import sessionize

    # Catalog normalizes the fixture's TIMESTAMP(NANOS) column
    ev = Catalog(spark, sf_dir)["events"].select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id",
        F.substring("event_type", 1, 1).alias("code"),
    )
    def run():
        sess = sessionize(ev, "user_id", "ts", 1800, tie_cols=("event_id",))
        strs = sess.groupBy("user_id", "session_id").agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "code"))
                    ),
                    lambda x: x["code"],
                ),
            ).alias("s")
        )
        return strs.agg(
            F.sum(F.col("s").rlike("e.*p").cast("long"))
        ).collect()

    t, _ = timed(run)
    return {"s": round(t, 1)}


def als_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.operators.recsys import als

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ratings = (
        orders.select(
            F.col("o_custkey").alias("user"),
            (F.col("o_orderkey") % 25).alias("item"),
        )
        .groupBy("user", "item")
        .agg(F.count("*").cast("double").alias("rating"))
    )
    t, (uf, _) = timed(lambda: als(ratings, rank=4, iters=2, reg=0.1))
    n = uf.count()
    return {"s": round(t, 1), "users": n}


def scc_probe(spark, sf_dir: str) -> dict:
    from dataflowex_spark.catalog import Catalog
    from dataflowex_spark.operators.graph import scc
    from dataflowex_spark.queries import _trade_edges

    cat = Catalog(spark, sf_dir)
    t, n = timed(
        lambda: scc(_trade_edges(cat).localCheckpoint(eager=True)).count()
    )
    return {"s": round(t, 1), "nodes": n}


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf1"
    spark = get_spark("scale-probe-r6d")
    spark.sparkContext.setLogLevel("ERROR")
    probes = {
        "aqp": aqp_probe,
        "iblt": iblt_probe,
        "golden": golden_probe,
        "pattern": pattern_probe,
        "als": als_probe,
        "scc": scc_probe,
    }
    for name, fn in probes.items():
        for tag, d in (("1x", SF1), ("10x", scaled)):
            print(name, tag, fn(spark, d), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
