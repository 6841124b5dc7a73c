"""End-to-end MV serving layer: ADVISE which summaries earn their
storage (q402's HRU greedy), BUILD them (q383), ROUTE dashboard
queries through the rewriter, keep them FRESH from a base-table
changefeed (q384/q403), and serve COUNT DISTINCT from the sketch
measure (q400) — the whole aggregate-awareness loop over the
engine's own storage layer.

Each stage returns evidence the pipeline's invariants hold (the
pytest in tests/test_examples.py asserts them):

1. advisor: lattice sizes from ONE cube pass; picked grains;
2. serving: every routed query's plan scans zero base files, and the
   served numbers equal direct recomputation;
3. freshness: after an insert-only merge on the base, one changefeed
   refresh re-synchronizes counts AND the distinct sketch.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.plans import formatted_plan
from dataflowex_spark.plans.mv import (
    MVCatalog,
    _hll_estimate_expr,
    _measure_exprs,
    hru_greedy,
    lattice_cell_counts,
    refresh_insert_only,
    with_hll_inputs,
)
from dataflowex_spark.sources.mtable import MTable


def run(spark: SparkSession, sf_dir: str) -> dict:
    root = tempfile.mkdtemp(prefix="mv_serving_")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.year("l_shipdate").alias("yr"),
            "l_partkey",
            F.floor(F.col("l_quantity") * 100).cast("long").alias("qc"),
            F.col("l_shipdate").cast("timestamp").alias("sd"),
        )
    )
    dims = ["l_returnflag", "l_linestatus", "yr"]

    # 1. advise: one cube pass sizes every candidate grain
    cells = lattice_cell_counts(li, dims)
    picks = hru_greedy(cells, k=2)
    chosen = [list(g) for g, _c, _b in picks if g]

    # 2. build the chosen summaries + a sketch measure on the finest
    mvs = MVCatalog(spark)
    aggs = {
        "n": ("count", None),
        "qc_s": ("sum", "qc"),
        "pk_hll": ("hll", "l_partkey"),
    }
    for i, grain in enumerate(chosen):
        mvs.define(f"mv{i}", "lineitem", li, grain, aggs, f"{root}/mv{i}")

    # 3. route dashboard queries; verify zero base scans + equality —
    # queries at each picked grain and at a coarser subset of it (the
    # advisor decides coverage, so the workload follows its picks)
    served = {}
    probe_keys = [chosen[0], chosen[0][:1]]
    if len(chosen) > 1:
        probe_keys.append(chosen[1])
    for keys in probe_keys:
        got = mvs.answer(
            "lineitem",
            keys,
            {
                "n": ("count", None),
                "qty": ("sum", "qc"),
                "parts": ("approx_distinct", "l_partkey"),
            },
        )
        assert got is not None, keys
        df, used = got
        plan = formatted_plan(df)
        assert "lineitem.parquet" not in plan, "rewrite leaked a scan"
        direct = li.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qc").alias("qty"),
        )
        a = {
            tuple(r[k] for k in keys): (r["n"], r["qty"])
            for r in df.collect()
        }
        b = {
            tuple(r[k] for k in keys): (r["n"], r["qty"])
            for r in direct.collect()
        }
        assert a == b, f"served != direct at {keys}"
        served[tuple(keys)] = used

    # 4. freshness: base MTable + insert-only merge + changefeed
    #    refresh of a persisted sketch summary
    frozen = li.withColumn(
        "rid", F.monotonically_increasing_id()
    ).localCheckpoint(eager=True)
    old = frozen.filter(F.col("sd") < F.lit("1997-01-01").cast("timestamp"))
    new = frozen.filter(
        F.col("sd") >= F.lit("1997-01-01").cast("timestamp")
    ).withColumn("rid", F.col("rid") + F.lit(1 << 60))
    base = MTable.create(
        spark,
        root + "/base",
        old.select("rid", "l_returnflag", "l_partkey", "qc")
        .repartitionByRange(8, "rid"),
        "rid",
    )
    s_aggs = {"n": ("count", None), "pk_hll": ("hll", "l_partkey")}
    mv0 = (
        with_hll_inputs(base.read(), s_aggs)
        .groupBy("l_returnflag")
        .agg(*_measure_exprs(s_aggs))
    )
    summary = MTable.create(spark, root + "/summary", mv0, "l_returnflag")
    base.merge(
        new.select(
            "rid",
            F.lit(1).alias("ts"),
            F.lit("I").alias("op"),
            F.lit(0).alias("tie"),
            "l_returnflag",
            "l_partkey",
            "qc",
        ),
        "ts",
        "op",
        "tie",
        ["l_returnflag", "l_partkey", "qc"],
    )
    refresh_insert_only(
        summary,
        base.read_changes(1, 2, images="both"),
        ["l_returnflag"],
        s_aggs,
    )
    refreshed = {
        r["l_returnflag"]: (r["n"], r["est"])
        for r in summary.read()
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            _hll_estimate_expr("pk_hll").alias("est"),
        )
        .collect()
    }
    rebuilt = {
        r["l_returnflag"]: (r["n"], r["est"])
        for r in with_hll_inputs(base.read(), s_aggs)
        .groupBy("l_returnflag")
        .agg(*_measure_exprs(s_aggs))
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            _hll_estimate_expr("pk_hll").alias("est"),
        )
        .collect()
    }
    assert refreshed == rebuilt, "refresh drifted from rebuild"

    return {
        "lattice_sizes": {"|".join(g): c for g, c in sorted(cells.items())},
        "picked": ["|".join(g) for g, _c, _b in picks],
        "served_by": {"|".join(k): v for k, v in served.items()},
        "refreshed_groups": len(refreshed),
    }


if __name__ == "__main__":
    import sys

    from dataflowex_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = run(get_spark("mv-serving-example"), sf)
    print(out)
