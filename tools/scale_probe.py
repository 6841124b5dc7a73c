"""10x scale probe for SCALE_NOTES.md: replicate sf0.1 fixtures with
key/time shifting that preserves per-key densities, then time selected
operators on 1x vs 10x. Usage:

    python tools/scale_probe.py [workdir]

Writes replicated tables under workdir (default /tmp/sgraft_scale) and
prints a markdown-ready timing table. Replication shifts surrogate
keys (and event timestamps by a year per copy) so join fanout and
window density stay constant — growth in runtime then measures the
operator, not an artificially densified key space.
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
        # table: (id col to shift, ts col to shift | None)
        "orders": ("o_orderkey", None),
        "documents": ("doc_id", None),
        "events": ("event_id", "ts"),
    }
    for tbl, (idc, tsc) in specs.items():
        out = f"{workdir}/{tbl}.parquet"
        if os.path.exists(out):
            continue
        base = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        parts = []
        for i in range(COPIES):
            df = base.withColumn(idc, F.col(idc) + F.lit(i * 10**9))
            if tsc is not None:
                if dict(base.dtypes).get(tsc) == "bigint":  # nanos-as-long
                    shift = F.lit(i * 365 * 86_400 * 10**9).cast("long")
                    df = df.withColumn(tsc, F.col(tsc) + shift)
                else:
                    df = df.withColumn(
                        tsc, F.col(tsc) + F.expr(f"INTERVAL {i * 365} DAYS")
                    )
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
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_scale"
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, workdir)

    from dataflowex_spark.operators.windows import global_ntile
    from dataflowex_spark.operators.dedup import decontaminate
    from dataflowex_spark.operators.etl import scd2_history
    from dataflowex_spark.operators.joins import (
        asof_join,
        asof_join_pairs,
        range_join_binned,
    )
    from dataflowex_spark.operators.packing import pack_sequences
    from dataflowex_spark.operators.text import winnow_fingerprints
    from dataflowex_spark.operators.timeseries import resample_locf
    from dataflowex_spark.functions.text import token_count

    def load(d, t):
        df = spark.read.parquet(f"{d}/{t}.parquet")
        if t == "events":
            # mirror catalog's nanos handling when present
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
                )
        return df

    for label, d in (("1x", SF_DIR), ("10x", workdir)):
        orders = load(d, "orders")
        docs = load(d, "documents")
        events = load(d, "events")
        bench(
            f"global_ntile(orders) {label}",
            lambda: global_ntile(
                orders.select("o_orderkey", "o_totalprice"),
                4,
                [F.col("o_totalprice").desc(), F.col("o_orderkey")],
            ).count(),
        )
        bench(
            f"decontaminate(docs) {label}",
            lambda: decontaminate(
                docs.repartition(spark.sparkContext.defaultParallelism).filter(
                    F.col("source") != "src0"
                ),
                docs.filter(F.col("source") == "src0"),
                n=13,
            ).count(),
        )
        bench(
            f"winnow_fingerprints(docs) {label}",
            lambda: winnow_fingerprints(
                docs.repartition(spark.sparkContext.defaultParallelism)
            ).count(),
        )
        bench(
            f"range_join_binned(events, keyless 10m) {label}",
            lambda: range_join_binned(
                events.select("event_type", "ts"),
                events.select("ts"),
                "ts",
                "ts",
                upper="10 minutes",
            ).count(),
        )
        bench(
            f"pack_sequences(docs, 512) {label}",
            lambda: pack_sequences(
                docs.select(
                    "source",
                    "doc_id",
                    token_count(F.col("text")).cast("bigint").alias("n_tok"),
                ),
                "source",
                "doc_id",
                "n_tok",
                budget=512,
            ).count(),
        )
        bench(
            f"scd2_history(events) {label}",
            lambda: scd2_history(
                events, "user_id", "ts", "event_type", tie_col="event_id"
            ).count(),
        )
        bench(
            f"resample_locf(events, day) {label}",
            lambda: resample_locf(
                events.filter(F.col("event_type") == "purchase"),
                "user_id",
                "ts",
                "value",
                unit="day",
            ).count(),
        )
        purchases = events.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = events.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", "ts"
        )
        bench(
            f"asof_join(union-interleave) {label}",
            lambda: asof_join(
                purchases, clicks, on="user_id", left_ts="ts",
                right_ts="ts", tie_break="click_id",
            ).count(),
        )
        bench(
            f"asof_join_pairs(quadratic reference) {label}",
            lambda: asof_join_pairs(
                purchases, clicks, on="user_id", left_ts="ts",
                right_ts="ts", tie_break="click_id",
            ).count(),
            runs=1,  # intentionally demonstrates the pair blowup
        )


if __name__ == "__main__":
    main()
