"""MTable merge scale probe: copy-on-write with file-level key-range
pruning vs the overwrite-everything alternative, at growing table
sizes with a FIXED-SIZE changeset — the 100 TB claim made measurable:
merge cost should track the affected-file count, not the table size.

Usage: python tools/mtable_probe_r5.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark
from dataflowex_spark.sources.mtable import MTable


def main() -> None:
    spark = get_spark()
    for n_rows, n_files in ((1_000_000, 16), (10_000_000, 64)):
        base = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 9973).alias("v"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartitionByRange(n_files, "k")
        )
        root = tempfile.mkdtemp(prefix="mtable_probe_")
        t0 = time.time()
        t = MTable.create(spark, root + "/t", base, "k")
        t_create = time.time() - t0

        # fixed 2,000-key changeset confined to one narrow key band
        lo = n_rows // 2
        changes = spark.range(lo, lo + 2_000).select(
            F.col("id").alias("k"),
            F.lit(1).alias("ts"),
            F.lit("U").alias("op"),
            F.lit(0).alias("tie"),
            F.lit(-1).cast("long").alias("v"),
            F.lit("upd").alias("payload"),
        )
        affected = len(t.affected_files(changes))
        t0 = time.time()
        t.merge(changes, "ts", "op", "tie", ["v", "payload"])
        t_merge = time.time() - t0

        t0 = time.time()
        t.overwrite(t.read())
        t_rewrite = time.time() - t0
        print(
            f"rows={n_rows} files={n_files}: create {t_create:.2f}s; "
            f"pruned merge touched {affected}/{n_files} files in "
            f"{t_merge:.2f}s; full rewrite {t_rewrite:.2f}s"
        )


if __name__ == "__main__":
    main()
