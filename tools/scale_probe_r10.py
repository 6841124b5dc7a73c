"""Round-10 scale probe: commit + planning economics of the r10
storage work. Claims under test:

- APPEND commit metadata cost is O(new files) under by-reference
  carry: the Nth append of a fixed-size batch costs the same as the
  1st, regardless of accumulated table size/manifest count (r9's
  flatten-carry rewrote O(live) entries per commit);
- LIST-LEVEL pruning makes selective planning O(matching-manifests):
  a one-partition read of an N-append table opens 1 manifest, and
  read wall stays flat as N grows;
- remove_orphan_files walks O(retained metadata), not O(storage):
  wall tracks manifest count, reclaim correctness already pytest'd.

Usage: python tools/scale_probe_r10.py [--json OUT]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataflowex_spark.session import get_spark  # noqa: E402
import dataflowex_spark.sources.iceberg_reader as ir  # noqa: E402


def main() -> None:
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark(
        "scale-probe-r10", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    doc: dict = {}

    dest = tempfile.mkdtemp(prefix="probe_r10_") + "/t"
    batch = lambda m: spark.createDataFrame(  # noqa: E731
        [(m * 10000 + j, m % 8, float(j)) for j in range(2000)],
        "k long, m long, x double",
    ).coalesce(1)

    # 1. append cost vs accumulated commits (fixed batch size)
    append_walls = []
    for m in range(48):
        t0 = time.time()
        ir.write_iceberg(
            spark, batch(m), dest,
            mode="error" if m == 0 else "append",
            partition_by=["m"],
        )
        append_walls.append(round(time.time() - t0, 3))
    doc["append_wall_first5"] = append_walls[1:6]
    doc["append_wall_last5"] = append_walls[-5:]

    # 2. selective read: manifests opened + wall as manifests grow
    t0 = time.time()
    n_sel = ir.read_iceberg(
        spark, dest, skip_where=[("m", "=", 3)]
    ).count()
    doc["selective_read"] = {
        "rows": n_sel,
        "wall_s": round(time.time() - t0, 3),
        "manifests_total": ir.PLAN_STATS["manifests_total"],
        "manifests_opened": ir.PLAN_STATS["manifests_opened"],
    }
    t0 = time.time()
    n_all = ir.read_iceberg(spark, dest).count()
    doc["full_read"] = {
        "rows": n_all,
        "wall_s": round(time.time() - t0, 3),
        "manifests_opened": ir.PLAN_STATS["manifests_opened"],
    }

    # 3. orphan cleanup wall on the 48-commit table (plus strays)
    import shutil

    some = next(
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(os.path.join(dest, "data"))
        for fn in fns
    )
    for i in range(20):
        stray = os.path.join(
            os.path.dirname(some), f"stray-{i}.parquet"
        )
        shutil.copyfile(some, stray)
        old = os.path.getmtime(some) - 100
        os.utime(stray, (old, old))
    t0 = time.time()
    reclaimed = ir.remove_orphan_files(dest, grace_s=0)
    doc["orphan_cleanup"] = {
        "reclaimed": len(reclaimed),
        "wall_s": round(time.time() - t0, 3),
    }
    assert len(reclaimed) == 20, reclaimed
    assert ir.read_iceberg(spark, dest).count() == n_all

    if out_path:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
