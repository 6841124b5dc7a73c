"""End-to-end WAREHOUSE CDC pipeline — the storage-side companion to
corpus_pipeline.py (curation) and eval_pipeline.py (scoring):

1. land a dimension snapshot in an MTable (manifest-versioned
   parquet, per-file key stats);
2. stream a CDC change feed into it with ``mtable_merge_stream`` —
   one copy-on-write MERGE commit per micro-batch, exactly-once under
   replay via the manifest's (app_id, batch_id) high-water mark, and
   only key-range-affected files rewritten per batch;
3. run the maintenance loop: ``compact`` the small per-batch files
   back to target size, ``vacuum`` the replaced versions;
4. audit: time-travel diff between the pre-merge and current versions
   through ``operators.etl.snapshot_diff``.

The run report is one dict a table owner reads top-to-bottom:
versions committed, files rewritten vs carried, rows changed by
status, files reclaimed.
"""

from __future__ import annotations

import os
import sys
import tempfile

# allow `python examples/<name>.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.etl import snapshot_diff
from dataflowex_spark.sources.mtable import MTable
from dataflowex_spark.streaming.ops import mtable_merge_stream


def run_warehouse_cdc(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    cat = Catalog(spark, sf_dir)

    # 1. land the snapshot (8 range-partitioned files, tight key ranges)
    cust = cat["customer"].repartitionByRange(8, "c_custkey")
    table = MTable.create(spark, os.path.join(workdir, "dim_customer"),
                          cust, "c_custkey")
    v0 = table.current_version()

    # 2. a deterministic CDC feed staged as 3 micro-batch files:
    #    balance updates for finished-order customers, then deletes,
    #    then synthetic inserts
    upd = (
        cat["orders"].filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey")).distinct()
        .select("c_custkey", F.lit(1).alias("ts"), F.lit("U").alias("op"),
                F.lit(0).alias("tie"),
                (F.col("c_custkey") % 1000).cast("double").alias("c_acctbal"))
    )
    dele = (
        cat["customer"].filter(F.col("c_custkey") % 97 == 0)
        .select("c_custkey", F.lit(2).alias("ts"), F.lit("D").alias("op"),
                F.lit(0).alias("tie"),
                F.lit(None).cast("double").alias("c_acctbal"))
    )
    ins = spark.range(1, 6).select(
        (F.col("id") + 10_000_000).alias("c_custkey"),
        F.lit(3).alias("ts"), F.lit("I").alias("op"), F.lit(0).alias("tie"),
        F.lit(0.0).alias("c_acctbal"),
    )
    feed_dir = os.path.join(workdir, "cdc_feed")
    for i, chunk in enumerate((upd, dele, ins)):
        chunk.coalesce(1).write.parquet(
            os.path.join(feed_dir, f"b{i}"), mode="overwrite"
        )
    # flatten into one stream directory, one file per micro-batch
    import glob
    import shutil

    flat = os.path.join(workdir, "cdc_flat")
    os.makedirs(flat, exist_ok=True)
    for i in range(3):
        src = glob.glob(os.path.join(feed_dir, f"b{i}", "part-*.parquet"))[0]
        dst = os.path.join(flat, f"part-{i:03d}.parquet")
        shutil.copy(src, dst)
        # the file source orders micro-batches by MODIFICATION TIME;
        # fast same-second copies tie, which can scramble the feed —
        # pin strictly increasing mtimes so batch order is the feed
        # order (a real CDC landing zone has this property naturally)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "c_custkey long, ts long, op string, tie long, c_acctbal double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(flat)
    )
    v_merged = mtable_merge_stream(
        stream, table, "ts", "op", "tie", ["c_acctbal"], app_id="cdc",
        checkpoint_dir=tempfile.mkdtemp(prefix="cdc_ckpt_"),
    )

    # 3. maintenance: compact per-batch residue, vacuum old versions
    pre_files = len(table.manifest()["files"])
    table.compact(target_rows=max(2, cust.count() // 8))
    reclaimed = table.vacuum(keep_last=2)  # keep current + one back

    # 4. audit: what did the feed change, end to end?
    diff = snapshot_diff(
        table.read(version=v0) if v0 in table.versions() else cust,
        table.read(),
        ["c_custkey"],
        compare_cols=["c_acctbal"],
    )
    by_status = {
        r["status"]: r["n"]
        for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    return {
        "versions_committed": v_merged - v0,
        "current_version": table.current_version(),
        "files_before_compact": pre_files,
        "files_after_compact": len(table.manifest()["files"]),
        "files_reclaimed": len(reclaimed),
        "rows_by_status": by_status,
    }


if __name__ == "__main__":
    from dataflowex_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    report = run_warehouse_cdc(get_spark(), sf, tempfile.mkdtemp(prefix="cdc_"))
    print(report)
