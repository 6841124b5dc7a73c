"""Round-11 scale probe: DISTRIBUTED orphan sweep vs driver-side.

VERDICT r10 item 3's done-bar: show the orphan sweep's wall-clock
follows file count on EXECUTORS, not single-threaded driver I/O.
Builds an Iceberg table with a real manifest history (N append
commits x F files each), plants S backdated stray files (the orphan
population), and times remove_orphan_files in both modes at 1x and
10x the stray count. Writes SCALE_PROBE_r11.json.

Usage: python tools/scale_probe_r11.py [--json OUT]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from dataflowex_spark.session import get_spark  # noqa: E402
import dataflowex_spark.sources.iceberg_reader as ir  # noqa: E402


def build(spark, root: str, commits: int, strays: int) -> None:
    for c in range(commits):
        ir.write_iceberg(
            spark,
            spark.range(c * 64, c * 64 + 64)
            .selectExpr("id as k", "cast(id as double) as x")
            .repartition(4),
            root,
            mode="error" if c == 0 else "append",
        )
    data_dir = os.path.join(root, "data")
    some = next(
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(data_dir)
        for fn in fns
        if fn.endswith(".parquet")
    )
    old = os.path.getmtime(some) - 1000
    for i in range(strays):
        sub = os.path.join(data_dir, f"stray_{i % 32:02d}")
        os.makedirs(sub, exist_ok=True)
        p = os.path.join(sub, f"stray-{i:05d}.parquet")
        shutil.copyfile(some, p)
        os.utime(p, (old, old))


def main() -> None:
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("scale-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}
    for label, commits, strays in (
        ("1x", 12, 400),
        ("10x", 24, 4000),
        ("100x", 24, 40000),
    ):
        row: dict = {"commits": commits, "strays": strays}
        for mode in ("driver", "distributed"):
            root = os.path.join(
                tempfile.mkdtemp(prefix=f"probe11_{label}_{mode}_"),
                "t",
            )
            build(spark, root, commits, strays)
            n_live_before = ir.read_iceberg(spark, root).count()
            t0 = time.time()
            deleted = ir.remove_orphan_files(
                root,
                grace_s=0,
                spark=spark if mode == "distributed" else None,
            )
            wall = time.time() - t0
            assert len(deleted) == strays, (len(deleted), strays)
            assert (
                ir.read_iceberg(spark, root).count() == n_live_before
            )
            row[mode + "_sec"] = round(wall, 3)
            shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        results[label] = row
        print(label, row, file=sys.stderr)
    results["note"] = (
        "both modes reclaim exactly the stray population and keep "
        "every live file; distributed runs the keep-set walk + "
        "candidate listing as Spark jobs"
    )
    blob = json.dumps(results, indent=2)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob + "\n")


if __name__ == "__main__":
    main()
