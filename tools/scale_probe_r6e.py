"""Round-6e decade probes: frequent itemsets, multi-source BFS
closeness, Shapley/Markov attribution, MV rewrite answer path.

Claimed scale shapes under test (1× = sf0.1, 10× = the replicated
schema from tools/make_scaled_schema.py — 10 disjoint key-shifted
universes, so per-key densities are IDENTICAL and volume is 10×):

- q385 itemsets: the candidate stream is support-bounded; the only
  row-scale work is the basket-key shuffle — expect ~linear wall.
  The support threshold scales with basket count (2%), so |Lk| is
  invariant per universe.
- q387 closeness: adjacency and frontier grow 10× (disjoint copies),
  rounds stay 4 — keyed join+agg per hop, expect ~linear.
- q390 Shapley: ONE journey aggregation is row-scale; the 16-mask
  enumeration is constant — expect scan-bound ~linear.
- q391 Markov: one windowed journey pass + transition count; the
  9-state × 5-scenario propagation is constant — expect ~linear.
- q383 MV answer path: the summary re-aggregation must be ~FLAT
  (summary rows grow with distinct grain cells, not fact rows);
  the define (build) pass is the linear part.

Usage: python tools/scale_probe_r6e.py [scaled_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.session import get_spark

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def itemsets_probe(spark, sf_dir):
    from dataflowex_spark.operators.itemsets import frequent_itemsets

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bi = li.select(
        F.col("l_orderkey").alias("b"),
        F.floor(F.sqrt(F.col("l_partkey") % 144)).cast("long").alias("i"),
    )
    nb = bi.select("b").distinct().count()
    t = (nb * 2 + 99) // 100
    sets = frequent_itemsets(bi, "b", "i", t, max_size=3)
    return sets.count()


def closeness_probe(spark, sf_dir):
    from dataflowex_spark.operators.graph import multi_source_bfs

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    lms = nodes.orderBy("node").limit(3)
    return multi_source_bfs(edges, lms, max_hops=4).count()


def _events_journeys(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import types as T

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        ev = ev.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    return ev


def shapley_probe(spark, sf_dir):
    from dataflowex_spark.operators.attribution import shapley_attribution

    ev = _events_journeys(spark, sf_dir)
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    journeys = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(
        F.coalesce(F.bit_or(bit), F.lit(0)).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    return shapley_attribution(
        journeys, [(1, "click"), (2, "error"), (4, "signup"), (8, "view")]
    ).count()


def markov_probe(spark, sf_dir):
    from pyspark.sql import Window

    from dataflowex_spark.operators.attribution import markov_removal_effect

    ev = _events_journeys(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "CONV")
        .otherwise(F.col("event_type"))
        .alias("st"),
    )
    w = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    seq = ev.select(
        "st",
        F.row_number().over(w).alias("rn"),
        F.lead("st").over(w).alias("nxt"),
    )
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("st").alias("dst")
    )
    mids = seq.filter(F.col("st") != "CONV").select(
        F.col("st").alias("src"),
        F.coalesce("nxt", F.lit("DROP")).alias("dst"),
    )
    trans = (
        starts.unionByName(mids)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return markov_removal_effect(
        trans, ["click", "error", "signup", "view"], rounds=8
    ).count()


def mv_probe(spark, sf_dir, root):
    from dataflowex_spark.plans.mv import MVCatalog

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.floor(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    mvs = MVCatalog(spark)
    t_def, _ = timed(
        lambda: mvs.define(
            "mv",
            "lineitem",
            li,
            ["l_returnflag", "ship_month"],
            {"n": ("count", None), "qc_s": ("sum", "qc")},
            root,
        )
    )
    t_ans, _ = timed(
        lambda: mvs.answer(
            "lineitem",
            ["l_returnflag"],
            {"n": ("count", None), "qty": ("sum", "qc")},
            where={"ship_month": ("1995-01", "1996-12")},
        )[0].collect()
    )
    return t_def, t_ans


def main():
    import tempfile

    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_schema"
    spark = get_spark("scale-probe-r6e")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name, fn in [
        ("itemsets_q385", itemsets_probe),
        ("closeness_q387", closeness_probe),
        ("shapley_q390", shapley_probe),
        ("markov_q391", markov_probe),
    ]:
        t1, n1 = timed(lambda: fn(spark, SF1))
        t10, n10 = timed(lambda: fn(spark, scaled))
        report[name] = {
            "t_1x": t1,
            "t_10x": t10,
            "ratio": round(t10 / max(t1, 1e-9), 2),
            "rows_1x": n1,
            "rows_10x": n10,
        }
        print(name, report[name], flush=True)
    d1, a1 = mv_probe(spark, SF1, tempfile.mkdtemp(prefix="mvp1_"))
    d10, a10 = mv_probe(spark, scaled, tempfile.mkdtemp(prefix="mvp10_"))
    report["mv_q383"] = {
        "define_1x": d1,
        "define_10x": d10,
        "define_ratio": round(d10 / max(d1, 1e-9), 2),
        "answer_1x": a1,
        "answer_10x": a10,
        "answer_ratio": round(a10 / max(a1, 1e-9), 2),
    }
    print("mv_q383", report["mv_q383"], flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
