"""Day-2 ICEBERG OPERATIONS runbook — the r9 maintenance surface as
one operational story (the Iceberg twin of dml_ops_runbook's Delta
arc), entirely through the from-scratch protocol implementation:

1. LAND a partitioned table and TAG the audit baseline ("the rows
   the model trained on") — an O(metadata) reproducibility pin;
2. run a DML WAVE: positional DELETE, UPDATE ... SET, a MERGE-shaped
   upsert, and a zero-scan EQUALITY key delete — four verbs, four
   cost points on the delete/update spectrum;
3. observe DELETE DEBT accumulate (sidecar files in the current
   snapshot's manifests), then REWRITE_DATA_FILES: fold the debt,
   bin-pack small files — read-identical before/after, zero delete
   manifests left;
4. EVOLVE the partition spec (metadata-only re-partition) and append
   under the new layout — both eras keep exact manifest pruning;
5. race CONCURRENT APPENDERS through the optimistic commit (true
   threads, put-if-absent CAS) — every change lands exactly once;
6. EXPIRE history with the audit tag pinned — the tag survives and
   still reads the exact baseline; drop it and expire again — now
   the history reclaims.

Each stage returns evidence tests/test_examples.py asserts.
"""

from __future__ import annotations

import os
import tempfile
import threading

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.sources.avro_io import read_container
from dataflowex_spark.sources.iceberg_reader import (
    _resolve_path,
    delete_from_iceberg,
    delete_keys_from_iceberg,
    drop_iceberg_ref,
    evolve_iceberg_partition_spec,
    expire_snapshots,
    load_table_metadata,
    remove_orphan_files,
    rewrite_iceberg_manifests,
    read_iceberg,
    rewrite_iceberg_data_files,
    set_iceberg_ref,
    update_iceberg,
    upsert_iceberg,
    write_iceberg,
)


def _snapshot_files(root: str) -> tuple[set, set]:
    """(data file paths, delete file paths) of the CURRENT snapshot."""
    meta = load_table_metadata(root)
    snap = [
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    ][0]
    _s, manifests = read_container(
        _resolve_path(root, snap["manifest-list"])
    )
    data, dele = set(), set()
    for m in manifests:
        _s2, entries = read_container(
            _resolve_path(root, m["manifest_path"])
        )
        for e in entries:
            if e["status"] == 2:
                continue
            d = e["data_file"]
            (dele if d.get("content", 0) else data).add(
                d["file_path"]
            )
    return data, dele


def run(spark: SparkSession, sf_dir: str) -> dict:
    ev: dict = {}
    cat = Catalog(spark, sf_dir)
    base = (
        cat["orders"]
        .filter(F.col("o_orderkey") % 23 == 9)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        .repartition(4)
    )
    root = tempfile.mkdtemp(prefix="iceberg_runbook_") + "/t"

    # 1. land + audit tag
    write_iceberg(spark, base, root, partition_by=["priority"])
    baseline = sorted(
        (r.okey, r.priority, r.cents)
        for r in read_iceberg(spark, root).collect()
    )
    ev["base_rows"] = len(baseline)
    set_iceberg_ref(root, "audit_baseline")

    # 2. the DML wave — four verbs, four cost points
    _s, n_del = delete_from_iceberg(spark, root, "okey % 7 = 1")
    _s, n_upd = update_iceberg(
        spark, root, "okey % 11 = 3", {"cents": "cents + 1"}
    )
    some_keys = (
        read_iceberg(spark, root)
        .filter(F.col("okey") % 13 == 5)
        .select("okey")
        .limit(50)
    )
    _s, n_eq = delete_keys_from_iceberg(spark, root, some_keys)
    ev["dml"] = {"deleted": n_del, "updated": n_upd, "eq_keys": n_eq}
    assert n_del > 0 and n_upd > 0 and n_eq > 0

    # 3. debt observed, then folded — read-identical
    _d0, del0 = _snapshot_files(root)
    ev["delete_files_before_fold"] = len(del0)
    before = sorted(
        (r.okey, r.priority, r.cents)
        for r in read_iceberg(spark, root).collect()
    )
    _sid, stats = rewrite_iceberg_data_files(
        spark, root, small_file_bytes=64 << 20
    )
    after = sorted(
        (r.okey, r.priority, r.cents)
        for r in read_iceberg(spark, root).collect()
    )
    _d1, del1 = _snapshot_files(root)
    ev["fold"] = {
        "read_identical": after == before,
        "delete_files_after": len(del1),
        "stats": stats,
    }

    # upsert AFTER the fold (positional DML refuses under eq debt,
    # which is exactly why the fold sits between them in the runbook)
    src = read_iceberg(spark, root).limit(20).select(
        "okey", F.lit("9-UPSERTED").alias("priority"), "cents"
    )
    _s, up_stats = upsert_iceberg(spark, root, src, ["okey"])
    ev["upsert"] = up_stats

    # 4. metadata-only re-partition + append under the new spec
    evolve_iceberg_partition_spec(root, [("okey", "bucket[8]")])
    extra = base.select(
        (F.col("okey") + 10_000_000).alias("okey"),
        F.lit("0-NEWERA").alias("priority"),
        F.col("cents"),
    ).limit(200)
    n_extra = extra.count()  # sf-dependent (small fixtures under-fill)
    write_iceberg(spark, extra, root, mode="append")
    pruned = read_iceberg(
        spark, root, skip_where=[("priority", "=", "0-NEWERA")]
    ).count()
    ev["spec_evolution"] = {
        "new_era_rows": pruned,
        "prunes_old_spec": n_extra > 0 and pruned == n_extra,
    }

    # 5. concurrent appenders through the CAS commit
    errs: list = []

    def appender(lo: int) -> None:
        try:
            write_iceberg(
                spark,
                spark.createDataFrame(
                    [(lo + j, "9-RACE", 1) for j in range(3)],
                    "okey long, priority string, cents long",
                ),
                root, mode="append",
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(20_000_000 + k,))
        for k in (0, 10, 20)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    raced = read_iceberg(spark, root).filter(
        F.col("priority") == "9-RACE"
    ).count()
    ev["race"] = {"errors": len(errs), "rows_landed": raced}

    # 6. ORPHAN CLEANUP cadence: after any burst of concurrent
    # commits, lost-race attempts have left attempt-unique staged
    # files that no snapshot references — reclaim them WITHOUT
    # expiring anything (run this weekly on busy tables; the default
    # 3-day grace protects in-flight staging, grace_s=0 here because
    # the burst is known-quiesced). Reads before == reads after.
    pre = read_iceberg(spark, root).count()
    orphans = remove_orphan_files(root, grace_s=0)
    ev["orphan_cleanup"] = {
        "reclaimed": len(orphans),
        "read_identical": read_iceberg(spark, root).count() == pre,
    }

    # 7. MANIFEST fold cadence: O(change) commits grow the list one
    # row per commit; fold it metadata-only when planning pays
    # (weekly with the orphan sweep is a good default)
    pre = read_iceberg(spark, root).count()
    _msid, mstats = rewrite_iceberg_manifests(spark, root)
    ev["manifest_fold"] = {
        "before": mstats["manifests_before"],
        "after": mstats["manifests_after"],
        "read_identical": read_iceberg(spark, root).count() == pre,
    }

    # 8. expire with the pin, read the tag, drop, expire again
    expire_snapshots(root, keep_last=1)
    tagged = sorted(
        (r.okey, r.priority, r.cents)
        for r in read_iceberg(
            spark, root, ref="audit_baseline"
        ).collect()
    )
    ev["tag_survives_expiry"] = tagged == baseline
    drop_iceberg_ref(root, "audit_baseline")
    expire_snapshots(root, keep_last=1)
    ev["snapshots_after_final_expiry"] = len(
        load_table_metadata(root)["snapshots"]
    )
    ev["final_rows"] = read_iceberg(spark, root).count()
    return ev


if __name__ == "__main__":
    from dataflowex_spark.session import get_spark

    sp = get_spark("iceberg-runbook")
    print(run(sp, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )))
