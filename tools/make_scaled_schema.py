"""Replicate the ENTIRE fixture schema N× with consistent key shifts —
an "sf1" materialized from sf0.1 so the whole headline suite (not just
single operators) can be benchmarked one decade up.

Every copy shifts ALL surrogate keys by i·10⁹, so referential
integrity holds inside each copy (orders.o_custkey still finds its
customer, lineitem its part/supplier/order) and the scaled dataset is
10 disjoint consistent universes — per-key densities identical to the
source, total volume 10×. Dimension-to-region/nation links are keyed
< 10⁹ and replicate shifted too. Timestamps are left unchanged:
per-day volumes grow 10×, which is exactly the stress wanted for the
calendar-rollup queries.

Usage: python tools/make_scaled_schema.py [outdir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SHIFTS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("make-scaled-schema")
    spark.sparkContext.setLogLevel("ERROR")
    for tbl, keys in SHIFTS.items():
        out = f"{outdir}/{tbl}.parquet"
        if os.path.exists(out):
            print(f"{tbl}: exists, skipping")
            continue
        base = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
        parts = []
        for i in range(copies):
            df = base
            for col in keys:
                df = df.withColumn(col, F.col(col) + F.lit(i * 10**9))
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"{tbl}: {copies}x written")


if __name__ == "__main__":
    main()
