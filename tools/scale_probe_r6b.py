"""Round-6b decade probes: deletion vectors, random walks, t-digest,
cogrouped asof, XML ingest.

Claimed scale shapes under test (1× = sf0.1, 10× = the replicated
schema from tools/make_scaled_schema.py):

- DV delete (q357 shape): cost ∝ predicate scan + deleted-row DV
  write — vs copy-on-write MERGE 'D' of the same keys, which rewrites
  every affected file. The gap should WIDEN at 10× (same delete
  fraction, 10× file bytes to rewrite on the CoW side).
- DV read overhead: read()+count after deletes vs before — the
  broadcast anti-join should be scan-dominated (near-flat overhead).
- random_walks (q359): 4 walks × 4 hops — edge scan dominates;
  broadcast state probes keep hop cost ~linear in edges.
- t-digest (q362): two scans (stats + bucketed compress) + bounded
  collect — ~linear.
- cogroup asof (q361): one co-partitioning shuffle both sides —
  ~linear in events.
- XML ingest (q360): scan-local serialize/parse — ~linear.

Usage: python tools/scale_probe_r6b.py [scaled_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def dv_probe(spark, sf_dir: str, tag: str) -> dict:
    from dataflowex_spark.sources.mtable import MTable

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    root = tempfile.mkdtemp(prefix=f"dvprobe_{tag}_")

    t_build, t = timed(
        lambda: MTable.create(
            spark, root + "/t",
            orders.repartitionByRange(32, "o_orderkey"), "o_orderkey",
        )
    )
    t_read0, n0 = timed(lambda: t.read().count())

    # merge-on-read delete
    t_dv, v = timed(
        lambda: t.delete_where(
            "o_orderstatus = 'F' AND o_orderkey % 5 = 0"
        )
    )
    t_read1, n1 = timed(lambda: t.read().count())

    # the same delete as copy-on-write MERGE 'D' on a fresh table
    t2 = MTable.create(
        spark, root + "/t2",
        orders.repartitionByRange(32, "o_orderkey"), "o_orderkey",
    )
    dele = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 5 == 0)
    ).select(
        "o_orderkey",
        F.lit(1).alias("ts"),
        F.lit("D").alias("op"),
        F.lit(0).alias("tie"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    t_cow, _ = timed(
        lambda: t2.merge(dele, "ts", "op", "tie", ["o_totalprice"])
    )
    return {
        "rows": n0,
        "deleted": n0 - n1,
        "dv_delete_s": round(t_dv, 2),
        "cow_delete_s": round(t_cow, 2),
        "read_plain_s": round(t_read0, 2),
        "read_dv_s": round(t_read1, 2),
    }


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sgraft_sf1"
    spark = get_spark("scale-probe-r6b")
    spark.sparkContext.setLogLevel("ERROR")

    from dataflowex_spark import queries as Q

    for name in (
        "q359_random_walks",
        "q360_xml_ingest",
        "q361_cogroup_asof_pandas",
        "q362_tdigest_quantiles",
    ):
        fn = Q.REGISTRY[name][0]
        w1, _ = timed(lambda: fn(spark, SF1).count())
        w10, _ = timed(lambda: fn(spark, scaled).count())
        print(
            f"{name}: 1x {w1:.1f}s  10x {w10:.1f}s  "
            f"ratio {w10 / max(w1, 0.01):.1f}x"
        )

    for tag, d in (("1x", SF1), ("10x", scaled)):
        r = dv_probe(spark, d, tag)
        print(f"dv_{tag}: {r}")


if __name__ == "__main__":
    main()
