"""Round-7b probes: the NEW interop surface under a decade of data —
claims are about what each cost follows:

- generic write_delta / write_iceberg: write cost follows data
  (executor-side staging + ONE stats pass); the COMMIT stays flat
  (one JSON / one avro manifest);
- data skipping (both formats): a narrow range query's planning is
  metadata-bound and its scan opens a ~constant file count, so the
  query is ~FLAT across the decade while a full scan grows.

Usage: python tools/scale_probe_r7b.py [scaled_dir]
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


def probe(spark, sf_dir):
    from dataflowex_spark.sources.delta_reader import (
        read_delta,
        write_delta,
    )
    from dataflowex_spark.sources.iceberg_reader import (
        read_iceberg,
        write_iceberg,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.monotonically_increasing_id().alias("rid"),
            F.floor(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("pc"),
        )
        .repartitionByRange(16, "rid")
    )
    root = tempfile.mkdtemp(prefix="probe_r7b_")
    t_wd, _ = timed(lambda: write_delta(spark, li, root + "/d"))
    t_wi, _ = timed(lambda: write_iceberg(spark, li, root + "/i"))
    # narrow range: first ~1/16 of rid space (range-partitioned)
    hi = li.selectExpr("percentile_approx(rid, 0.06) p").first()["p"]
    t_dq, dn = timed(
        lambda: read_delta(
            spark, root + "/d", skip_where=[("rid", "<=", int(hi))]
        ).count()
    )
    d_files = len(
        read_delta(
            spark, root + "/d", skip_where=[("rid", "<=", int(hi))]
        ).inputFiles()
    )
    t_iq, _n = timed(
        lambda: read_iceberg(
            spark, root + "/i", skip_where=[("rid", "<=", int(hi))]
        ).count()
    )
    i_files = len(
        read_iceberg(
            spark, root + "/i", skip_where=[("rid", "<=", int(hi))]
        ).inputFiles()
    )
    t_full, _ = timed(lambda: read_delta(spark, root + "/d").count())
    return {
        "write_delta": t_wd,
        "write_iceberg": t_wi,
        "skip_query_delta": t_dq,
        "delta_files_opened": d_files,
        "skip_query_iceberg": t_iq,
        "iceberg_files_opened": i_files,
        "full_scan_delta": t_full,
    }


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_schema"
    spark = get_spark("scale-probe-r7b")
    spark.sparkContext.setLogLevel("ERROR")
    report = {"1x": probe(spark, SF1), "10x": probe(spark, scaled)}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
