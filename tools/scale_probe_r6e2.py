"""Round-6e follow-up probes: open-format interop and the serving
layer — the claims here are METADATA-BOUNDEDNESS, not throughput:

- MTable→Delta export: hard-links + one commit JSON — must be ~flat
  in data volume (zero bytes copied);
- Delta snapshot resolution + aggregate read-back: resolution flat,
  the aggregate linear (ordinary parquet scan economics);
- result cache: the MISS pays the query, the HIT must be ~flat in
  BASE size (it scans only the stored result);
- sketch-MV distinct answer: ~flat (summary rows, not fact rows).

Usage: python tools/scale_probe_r6e2.py [scaled_dir]
"""

from __future__ import annotations

import json
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
    return round(time.time() - t0, 2), out


def delta_probe(spark, sf_dir):
    from dataflowex_spark.sources.delta_reader import (
        export_snapshot_to_delta,
        read_delta,
    )
    from dataflowex_spark.sources.mtable import MTable

    root = tempfile.mkdtemp(prefix="probe_delta_")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
    ).withColumn("rid", F.monotonically_increasing_id())
    t_create, t = timed(
        lambda: MTable.create(
            spark, root + "/t", li.repartitionByRange(16, "rid"), "rid"
        )
    )
    t_export, _ = timed(
        lambda: export_snapshot_to_delta(t, root + "/delta")
    )
    t_read, n = timed(
        lambda: read_delta(spark, root + "/delta")
        .groupBy("l_returnflag")
        .agg(F.sum("pc"))
        .count()
    )
    return {"create": t_create, "export": t_export, "read_agg": t_read}


def cache_probe(spark, sf_dir):
    from dataflowex_spark.plans.result_cache import ResultCache

    cache = ResultCache(spark, tempfile.mkdtemp(prefix="probe_rc_"))

    def q():
        return (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    t_miss, (_df, h0) = timed(lambda: cache.get_or_compute(q()))
    t_hit, (df2, h1) = timed(
        lambda: cache.get_or_compute(q())
    )
    df2.count()
    assert (h0, h1) == (False, True)
    return {"miss": t_miss, "hit": t_hit}


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_schema"
    spark = get_spark("scale-probe-r6e2")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name, fn in [("delta_interop", delta_probe), ("result_cache", cache_probe)]:
        r1 = fn(spark, SF1)
        r10 = fn(spark, scaled)
        report[name] = {"1x": r1, "10x": r10}
        print(name, report[name], flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
