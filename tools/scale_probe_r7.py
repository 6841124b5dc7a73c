"""Round-7 decade probes: the SERVING layer under load (r6 VERDICT
next-round item 9) — claims are about what each cost FOLLOWS:

- MV incremental refresh (q384) and streaming MV maintenance (q394):
  refresh cost follows CHANGE volume, not base volume — one decade
  of base growth must not cost a decade of refresh;
- lakehouse federation read (q412): per-format metadata walks +
  ordinary scans — linear in data, flat in metadata;
- MTable CONCURRENT commits (the retry path): two writers race the
  same table; the loser's with_retry replay costs one re-merge of
  ITS OWN change set, not a base rewrite;
- result-cache concurrent misses: two sessions compute the same
  fingerprint at once; the rename claim is atomic, exactly one copy
  lands in the store, both callers get correct frames.

Usage: python tools/scale_probe_r7.py [scaled_dir]
(scaled_dir default /tmp/sf1_schema — tools/make_scaled_schema.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def query_probe(spark, sf_dir):
    """q384 / q394 / q412 end-to-end wall at this scale."""
    from dataflowex_spark.queries import REGISTRY

    out = {}
    for name in (
        "q384_mv_incremental_refresh",
        "q394_stream_mv_refresh",
        "q412_lakehouse_federation",
    ):
        fn = REGISTRY[name][0]
        t, _ = timed(lambda f=fn: f(spark, sf_dir).count())
        out[name.split("_")[0]] = t
    return out


def concurrent_commit_probe(spark, sf_dir):
    """Two writers race disjoint merges into ONE MTable; the loser
    retries through with_retry. Final state must equal the serial
    result; the retry replays only the loser's change set."""
    from dataflowex_spark.sources.mtable import MTable

    root = tempfile.mkdtemp(prefix="probe_ccommit_")
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
    t_create, t = timed(
        lambda: MTable.create(spark, root + "/t", li, "rid")
    )
    base_n = t.read().count()

    def upd(mod):
        return (
            t.read()
            .filter(F.col("rid") % 100 == mod)
            .select(
                "rid",
                F.lit(1).alias("ts"),
                F.lit("U").alias("op"),
                F.lit(0).alias("tie"),
                (F.col("pc") + 1).alias("pc"),
            )
        )

    errs = []

    def writer(mod):
        try:
            t.merge_retry(upd(mod), "ts", "op", "tie", ["pc"])
        except Exception as e:  # surface in main thread
            errs.append(e)

    t0 = time.time()
    th = [threading.Thread(target=writer, args=(m,)) for m in (3, 4)]
    [x.start() for x in th]
    [x.join() for x in th]
    t_race = round(time.time() - t0, 2)
    if errs:
        raise errs[0]
    got = t.read().count()
    assert got == base_n, (got, base_n)
    # both merges landed: two new versions past the create
    assert t.manifest()["version"] >= 2
    return {"create": t_create, "racing_merges": t_race}


def concurrent_cache_probe(spark, sf_dir):
    from dataflowex_spark.plans.result_cache import ResultCache

    root = tempfile.mkdtemp(prefix="probe_ccache_")
    cache = ResultCache(spark, root)

    def q():
        return (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    results = {}

    def caller(tag):
        df, hit = cache.get_or_compute(q())
        results[tag] = (df.count(), hit)

    t0 = time.time()
    th = [
        threading.Thread(target=caller, args=(tag,)) for tag in ("a", "b")
    ]
    [x.start() for x in th]
    [x.join() for x in th]
    t_race = round(time.time() - t0, 2)
    counts = {v[0] for v in results.values()}
    assert len(counts) == 1, results
    entries = [fn for fn in os.listdir(root) if not fn.startswith("_job")]
    assert len(entries) == 1, entries  # exactly one claimed copy
    t_hit, _ = timed(lambda: cache.get_or_compute(q())[0].count())
    return {"racing_misses": t_race, "hit_after": t_hit}


def main():
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_schema"
    spark = get_spark("scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name, fn in [
        ("serving_queries", query_probe),
        ("concurrent_commits", concurrent_commit_probe),
        ("concurrent_cache", concurrent_cache_probe),
    ]:
        r1 = fn(spark, SF1)
        r10 = fn(spark, scaled)
        report[name] = {"1x": r1, "10x": r10}
        print(name, report[name], flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
