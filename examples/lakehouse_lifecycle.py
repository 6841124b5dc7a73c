"""End-to-end LAKEHOUSE LIFECYCLE over the open-format layer: an
MTable lives its whole life PUBLISHED to both Delta and Iceberg —
export, mutate, incrementally publish (with CDC), consume the change
feed, compact the log, time-travel, and finally reclaim space — all
through the from-scratch protocol implementations (no delta-spark /
iceberg-spark JARs anywhere).

The story a real platform runs every day:

1. INGEST a customer slice into an MTable (range-partitioned, stats);
2. PUBLISH the snapshot to Delta AND Iceberg (zero-copy hard-links;
   per-file stats/bounds land at publish time);
3. MUTATE the MTable (one merge: updates + a delete);
4. INCREMENTAL PUBLISH to both formats — the Delta commit carries
   authoritative CDC files derived from the MTable changefeed;
5. CONSUME the Delta change feed downstream (exact row-level I/U/D);
6. POINT-QUERY both formats through their skipping surfaces and
   PROVE file pruning happened;
7. COMPACT the Delta log (checkpoint) and EXPIRE Iceberg history,
   then VACUUM Delta — reads stay exact after every lifecycle step.

Each stage returns evidence the pytest asserts (tests/
test_examples.py): snapshot equality at every version, CDC counts
matching the merge's true change set, pruned file counts, and
post-reclaim exactness.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.sources.delta_reader import (
    checkpoint_delta_export,
    export_delta_increment,
    export_snapshot_to_delta,
    read_delta,
    read_delta_changes,
    vacuum_delta_export,
)
from dataflowex_spark.sources.iceberg_reader import (
    expire_snapshots,
    export_iceberg_increment,
    export_snapshot_to_iceberg,
    read_iceberg,
)
from dataflowex_spark.sources.mtable import MTable


def run(spark: SparkSession, sf_dir: str) -> dict:
    root = tempfile.mkdtemp(prefix="lakehouse_")
    ev: dict = {}

    # 1. ingest
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100).cast("long").alias(
                "bal_cents"
            ),
        )
        .repartitionByRange(12, "c_custkey")
    )
    t = MTable.create(spark, root + "/t", cust, "c_custkey")
    ev["base_rows"] = t.read().count()

    # 2. publish v1 to both formats
    d_dest, i_dest = root + "/delta", root + "/iceberg"
    export_snapshot_to_delta(t, d_dest)
    export_snapshot_to_iceberg(t, i_dest)
    ev["v1_delta_equal"] = (
        sorted(map(tuple, read_delta(spark, d_dest).collect()))
        == sorted(map(tuple, t.read().collect()))
    )
    ev["v1_iceberg_equal"] = (
        sorted(map(tuple, read_iceberg(spark, i_dest).collect()))
        == sorted(map(tuple, t.read().collect()))
    )

    # 3. mutate: +1000 cents for custkey%10==0, delete custkey%97==3
    upd = t.read().filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 97 != 3)
    ).select(
        "c_custkey",
        F.lit(1).alias("ts"),
        F.lit("U").alias("op"),
        F.lit(0).alias("tie"),
        (F.col("bal_cents") + 1000).alias("bal_cents"),
    )
    dele = t.read().filter(F.col("c_custkey") % 97 == 3).select(
        "c_custkey",
        F.lit(1).alias("ts"),
        F.lit("D").alias("op"),
        F.lit(0).alias("tie"),
        F.lit(None).cast("long").alias("bal_cents"),
    )
    n_upd = upd.count()
    n_del = dele.count()
    t.merge(upd.unionByName(dele), "ts", "op", "tie", ["bal_cents"])

    # 4. incremental publish (Delta commit carries CDC files)
    dv = export_delta_increment(t, d_dest)
    export_iceberg_increment(t, i_dest)
    ev["v2_delta_equal"] = (
        sorted(map(tuple, read_delta(spark, d_dest).collect()))
        == sorted(map(tuple, t.read().collect()))
    )
    ev["v2_iceberg_equal"] = (
        sorted(map(tuple, read_iceberg(spark, i_dest).collect()))
        == sorted(map(tuple, t.read().collect()))
    )

    # 5. downstream CDF consumer sees the EXACT change set
    ch = read_delta_changes(spark, d_dest, dv, dv)
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ev["cdc_matches_merge"] = by_type == {
        "update_preimage": n_upd,
        "update_postimage": n_upd,
        "delete": n_del,
    }

    # 6. point queries prune files in both formats
    total = len(t.manifest()["files"])
    d_narrow = read_delta(
        spark, d_dest,
        skip_where=[("c_custkey", ">=", 100), ("c_custkey", "<=", 160)],
    )
    i_narrow = read_iceberg(
        spark, i_dest,
        skip_where=[("c_custkey", ">=", 100), ("c_custkey", "<=", 160)],
    )
    ev["pruning"] = {
        "total_files": total,
        "delta_opened": len(d_narrow.inputFiles()),
        "iceberg_opened": len(i_narrow.inputFiles()),
        "agree": sorted(map(tuple, d_narrow.collect()))
        == sorted(map(tuple, i_narrow.collect())),
    }

    # 7. compact + expire + vacuum; reads stay exact
    want = sorted(map(tuple, t.read().collect()))
    checkpoint_delta_export(spark, d_dest)
    # retention ages out everything the checkpoint covers EXCEPT the
    # newest commit (real retention always keeps the log tail)
    for v in range(dv):
        os.remove(
            os.path.join(d_dest, "_delta_log", f"{v:020d}.json")
        )
    deleted_d = vacuum_delta_export(d_dest, keep_versions=1, spark=spark)
    deleted_i = expire_snapshots(i_dest, keep_last=1)
    ev["reclaim"] = {
        "delta_deleted": len(deleted_d),
        "iceberg_deleted": len(deleted_i),
        "delta_exact_after": sorted(
            map(tuple, read_delta(spark, d_dest).collect())
        )
        == want,
        "iceberg_exact_after": sorted(
            map(tuple, read_iceberg(spark, i_dest).collect())
        )
        == want,
    }
    return ev
