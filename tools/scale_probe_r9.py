"""Round-9 scale probe: Iceberg maintenance + DML economics across a
data decade. Claims under test:

- delete_from_iceberg / update_iceberg cost follows MATCHED volume
  (pruned scan + change-bound sidecar/image writes), flat across a
  10x table for a fixed change set;
- delete_keys_from_iceberg is O(key bytes) — NO scan, near-constant
  at any table size (the zero-scan end of the delete spectrum);
- rewrite_iceberg_data_files (pos-delete fold) scans ONLY the
  chosen (delete-targeted) files — change-LOCALITY-bound, not
  table-bound, when debt is localized; the eq fold and full
  bin-pack are honestly table-sized (documented);
- set_iceberg_ref / expire_snapshots are O(metadata).

Usage: python tools/scale_probe_r9.py [--json OUT]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from dataflowex_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def run(spark, n_rows: int, tag: str) -> dict:
    from pyspark.sql import functions as F

    from dataflowex_spark.sources.iceberg_reader import (
        delete_from_iceberg,
        delete_keys_from_iceberg,
        expire_snapshots,
        read_iceberg,
        rewrite_iceberg_data_files,
        set_iceberg_ref,
        update_iceberg,
        write_iceberg,
    )

    dest = tempfile.mkdtemp(prefix=f"probe_r9_{tag}_") + "/t"
    base = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).alias("a"),
        (F.col("id") % 37).cast("double").alias("x"),
    ).repartition(16)
    out = {}
    out["write"], _ = timed(
        lambda: write_iceberg(spark, base, dest)
    )
    # fixed 10k-row delete regardless of table size
    out["delete_10k_rows"], (_s, n) = timed(
        lambda: delete_from_iceberg(spark, dest, "k < 10000")
    )
    assert n == 10000, n
    # fixed 5k-row update regardless of table size
    out["update_5k_rows"], (_s, nu) = timed(
        lambda: update_iceberg(
            spark, dest, "k >= 10000 AND k < 15000",
            {"x": "x + 1.0"},
        )
    )
    assert nu == 5000, nu
    # zero-scan equality delete of 1k keys
    keys = spark.range(20000, 21000).select(F.col("id").alias("k"))
    out["eq_delete_1k_keys"], (_s, nk) = timed(
        lambda: delete_keys_from_iceberg(spark, dest, keys)
    )
    assert nk == 1000, nk
    # fold the eq debt first (table-sized, honest), then probe the
    # pos-fold in isolation on a fresh localized delete
    out["rewrite_eq_fold_tablesized"], (_s, st) = timed(
        lambda: rewrite_iceberg_data_files(spark, dest)
    )
    out["_eq_fold_stats"] = st
    out["delete_again_10k"], _ = timed(
        lambda: delete_from_iceberg(
            spark, dest, "k >= 30000 AND k < 40000"
        )
    )
    out["rewrite_pos_fold"], (_s, st2) = timed(
        lambda: rewrite_iceberg_data_files(spark, dest)
    )
    out["_pos_fold_stats"] = st2
    out["tag_ref"], _ = timed(
        lambda: set_iceberg_ref(dest, "pin")
    )
    out["expire"], _ = timed(
        lambda: expire_snapshots(dest, keep_last=1)
    )
    out["read_after"], cnt = timed(
        lambda: read_iceberg(spark, dest).count()
    )
    out["_rows_after"] = cnt
    return out


def main() -> None:
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    spark = get_spark("dataflowex-probe-r9")
    spark.sparkContext.setLogLevel("ERROR")
    res = {
        "probe": "r9_iceberg_maintenance_dml",
        "sizes": {},
    }
    for n, tag in ((2_000_000, "1x"), (20_000_000, "10x")):
        res["sizes"][tag] = run(spark, n, tag)
        print(tag, json.dumps(res["sizes"][tag]), file=sys.stderr)
    one, ten = res["sizes"]["1x"], res["sizes"]["10x"]
    res["growth"] = {
        k: round(ten[k] / max(one[k], 0.01), 2)
        for k in one
        if not k.startswith("_")
    }
    print(json.dumps(res))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
