"""Property-style invariants (SURVEY §5.4) on the real fixtures:
split partitions the input, join+anti complement to the whole,
dedup idempotence, session events conservation."""

import pytest
from pyspark.sql import functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.dedup import dedup_exact
from dataflowex_spark.operators.etl import dim_join_insert_missing
from dataflowex_spark.operators.windows import sessionize
from dataflowex_spark import queries as Q


@pytest.fixture(scope="module")
def cat(spark, sf_dir):
    return Catalog(spark, sf_dir)


def test_split_branches_partition_input(spark, sf_dir, cat):
    """q04 branches are disjoint and exhaustive: tag counts sum to the
    source count and no orderkey appears twice."""
    out = Q.REGISTRY["q04_filter_split"][0](spark, sf_dir)
    assert out.count() == cat["orders"].count()
    assert out.select("o_orderkey").distinct().count() == cat["orders"].count()


def test_semi_plus_anti_complement(cat):
    c = cat["customer"]
    open_orders = cat["orders"].filter(F.col("o_orderstatus") == "O")
    semi = c.join(open_orders, c["c_custkey"] == F.col("o_custkey"), "left_semi")
    anti = c.join(open_orders, c["c_custkey"] == F.col("o_custkey"), "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.join(anti, "c_custkey").count() == 0


def test_dedup_idempotent(cat):
    once = dedup_exact(cat["documents"])
    twice = dedup_exact(once)
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0


def test_insert_missing_conserves_and_completes(cat):
    fact = cat["orders"].select("o_orderkey", "o_custkey")
    dim = (
        cat["customer"]
        .filter(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("o_custkey"))
        .withColumn("sk", F.col("o_custkey") * 10)
    )
    enriched, updated, inserted = dim_join_insert_missing(fact, dim, key="o_custkey")
    # left-enrichment: row conservation + no missing surrogates
    assert enriched.count() == fact.count()
    assert enriched.filter(F.col("sk").isNull()).count() == 0
    # dim grows by exactly the distinct miss set
    assert updated.count() == dim.count() + inserted.count()


def test_sessionize_conserves_events(cat):
    sess = sessionize(cat["events"], "user_id", "ts", tie_cols=("event_id",))
    assert sess.count() == cat["events"].count()
    # session ids are dense per user starting at 1
    agg = sess.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.countDistinct("session_id").alias("n"),
    )
    bad = agg.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
    assert bad.count() == 0


def test_driver_contract_surface():
    """Contract invariants the driver relies on: every oracle belongs
    to a declared query, every query name is unique and well-formed,
    and SURVEY §2.1 declares exactly the queries() inventory."""
    import re

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(re.match(r"^q\d+_[a-z0-9_]+$", n) for n in qs)
    survey = open("SURVEY.md").read()
    declared = set(re.findall(r"(q\d+_[a-z0-9_]+)\[[OR]\]", survey))
    assert declared == set(qs), (
        sorted(declared - set(qs)), sorted(set(qs) - declared)
    )
    # rows-only queries are marked [R], oracled ones [O]
    marks = dict(re.findall(r"(q\d+_[a-z0-9_]+)\[([OR])\]", survey))
    for name in qs:
        assert marks[name] == ("O" if name in oracles else "R"), name
    # §2 Part B addendum prose must keep up with the inventory: every
    # post-round-1 query number (q99+) appears in an addendum table row
    addendum = survey.split("### Part B addendum")[1].split("### §2.1")[0]
    cited = set(re.findall(r"q(\d+)", addendum))
    for name in qs:
        num = int(name[1:].split("_")[0])
        if num >= 99:
            assert str(num) in cited or any(
                int(a) <= num <= int(b)
                for a, b in re.findall(r"q(\d+)–q(\d+)", addendum)
            ), f"{name} missing from SURVEY §2 Part B addendum"


def test_queries_manifest_matches_registry():
    """queries_manifest.json — the machine-readable inventory shipped
    for the driver's correctness gate — must list exactly the queries()
    name SET with accurate oracle flags. Deliberately ORDER-INSENSITIVE:
    queries() iteration order rotates never-driver-checked names first
    (it changes whenever the driver drops a new CORRECTNESS_r*.json),
    while the manifest is committed in stable registry-declaration
    order. Round 4 lesson: asserting exact order made every new driver
    artifact break the committed manifest. Regenerate with
    tools/gen_manifest.py after adding a query."""
    import json

    import __spark_entry__ as entry

    with open("queries_manifest.json") as f:
        m = json.load(f)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert {e["name"] for e in m["queries"]} == set(qs)
    assert len(m["queries"]) == len(qs)  # no duplicate manifest rows
    assert m["total"] == len(qs)
    assert m["oracled"] == len(oracles)
    for e in m["queries"]:
        assert e["oracle"] == (e["name"] in oracles), e["name"]


def test_no_python_eval_in_relational_paths(spark, sf_dir):
    """The UDF discipline as a regression gate: a representative slice
    of the relational surface (joins, aggs, windows, dedup, text,
    warehouse, graph, similarity) must plan ZERO Python eval nodes —
    Python appears only in the declared pandas/codec operators. Any
    new .withColumn(udf(...)) sneaking into these paths fails here,
    not in a benchmark three rounds later."""
    from dataflowex_spark.plans import plan_stats
    from dataflowex_spark.queries import REGISTRY

    relational = [
        "q01_project_transform",
        "q20_join_inner_multi",
        "q25_join_asof",
        "q30_agg_pricing_summary",
        "q40_window_rank",
        "q80_dedup_exact",
        "q81_neardup_minhash",
        "q83_text_stats",
        "q89_tfidf_top_term",
        "q99_decontaminate",
        "q122_scd2_history",
        "q131_pagerank",
        "q139_market_share",
        "q163_triangle_count",
        "q211_sparse_cosine_pairs",
        "q235_prefix_filter_jaccard",
        "q238_roc_auc",
        "q253_quantile_normalize",
        "q289_ratio_to_report",
        "q290_asof_bounded",
        "q293_cc_star_chains",
    ]
    offenders = {}
    for name in relational:
        fn = REGISTRY[name][0]
        s = plan_stats(fn(spark, sf_dir))
        if s["python_evals"]:
            offenders[name] = s["python_evals"]
    assert not offenders, offenders


def test_no_unpartitioned_window_in_stat_queries(spark, sf_dir):
    """r5 verdict closure: the ordered passes in roc_auc / KS / PSI /
    the dwell percentiles must not plan an all-rows-to-one-reducer
    WindowExec at ANY scale — the two-pass global_cumsum (or a
    value-domain-bounded compaction for q230) replaced the
    unpartitioned Window.orderBy. This pins the plan shape so an
    edit cannot silently reintroduce the single-reducer stage."""
    from dataflowex_spark.plans import plan_stats
    from dataflowex_spark.queries import REGISTRY

    for name in (
        "q238_roc_auc",
        "q240_ks_drift",
        "q251_psi",
        "q230_dwell_distribution",
        "q263_weekly_auc",
    ):
        fn = REGISTRY[name][0]
        s = plan_stats(fn(spark, sf_dir))
        assert s["unpartitioned_windows"] == 0, (name, s)
