"""Pipeline kernel tests — mirror the reference's per-component
lifecycle tests (SURVEY.md §5): routing disjointness, broadcast
delivery, dispatcher grouping, fault propagation with node names,
ring completion."""

import pytest
from pyspark.sql import Row, functions as F

from dataflowex_spark.pipeline import Pipeline, PipelineError, ring_iterate


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [Row(name="ada", age=36), Row(name="bob", age=17), Row(name="cyd", age=64)]
    )


def test_transform_mapping(people):
    rows = (
        Pipeline(people)
        .transform({"n": F.upper("name"), "age2": F.col("age") * 2})
        .run()
    )
    assert {(r.n, r.age2) for r in rows} == {("ADA", 72), ("BOB", 34), ("CYD", 128)}


def test_flat_map_explode(spark):
    df = spark.createDataFrame([Row(line="a=1&b=2")])
    rows = (
        Pipeline(df)
        .flat_map(F.split("line", "&"), alias="kv", keep=[])
        .run()
    )
    assert {r.kv for r in rows} == {"a=1", "b=2"}


def test_filter(people):
    assert Pipeline(people).filter(F.col("age") >= 18).count() == 2


def test_split_disjoint_exhaustive(people):
    branches = Pipeline(people).split(
        {"adult": F.col("age") >= 18, "minor": F.col("age") < 18},
        leftover="rest",
    )
    counts = {k: p.count() for k, p in branches.items()}
    assert counts == {"adult": 2, "minor": 1, "rest": 0}
    # first-match-wins on overlapping predicates (reference link order)
    overlap = Pipeline(people).split(
        {"a": F.col("age") > 0, "b": F.col("age") > 10}, leftover=None
    )
    assert overlap["a"].count() == 3
    assert overlap["b"].count() == 0


def test_fan_out_shares_source(people):
    b1, b2 = Pipeline(people).fan_out(2)
    assert b1.count() == b2.count() == 3


def test_fan_out_cache_released(people):
    b1, b2 = Pipeline(people).fan_out(2, cache=True)
    base = b1._cached_base
    assert b1.count() == 3
    assert base.storageLevel.useMemory  # cached while branches run
    b1.unpersist()
    assert not base.storageLevel.useMemory  # and releasable afterwards
    b2.unpersist()  # no-op: shared base already released
    assert b1.unpersist() is b1  # idempotent


def test_runtime_failure_names_node(people):
    """A17: a mid-ACTION failure (UDF raising at execution, not plan
    time) must surface the faulting node's name, like the reference's
    PropagatedException names the faulting block."""
    import pytest
    from pyspark.sql.types import LongType
    from dataflowex_spark.pipeline import PipelineError

    def boom(v):
        raise ValueError("runtime kaboom")

    boom_udf = F.udf(boom, LongType())
    p = (
        Pipeline(people, name="ft")
        .transform(lambda df: df.select("name", "age"), name="proj")
        .transform(lambda df: df.withColumn("b", boom_udf(F.col("age"))), name="badnode")
        .transform(lambda df: df.filter(F.col("age") > 0), name="post")
    )
    with pytest.raises(PipelineError) as ei:
        p.run()
    assert ei.value.node == "badnode"


def test_timed_report_rows_and_ms(people):
    """A19: per-node rows + wall-ms."""
    p = (
        Pipeline(people, name="tr")
        .transform(lambda df: df.select("name", "age"), name="proj")
        .transform(lambda df: df.filter(F.col("age") > 20), name="flt")
    )
    rep = p.timed_report()
    assert list(rep) == ["proj", "flt"]
    assert rep["proj"]["rows"] == 3 and rep["flt"]["rows"] == 2
    assert all(n["ms"] >= 0 for n in rep.values())


def test_schema_flatten_three_levels(spark):
    """TypeAccessor parity: 3-level nested struct flattens to dotted
    leaf columns; a NULL mid-path struct navigates null-safely; arrays
    remain leaves."""
    from dataflowex_spark.schema import flatten, schema_paths

    df = spark.createDataFrame(
        [
            Row(id=1, a=Row(b=Row(c=7, d="x"), e=2.5), tags=["t1"]),
            Row(id=2, a=Row(b=None, e=1.0), tags=[]),
            Row(id=3, a=None, tags=None),
        ]
    )
    paths = [p for p, _ in schema_paths(df.schema)]
    assert paths == ["id", "a.b.c", "a.b.d", "a.e", "tags"]
    flat = flatten(df)
    assert flat.columns == ["id", "a.b.c", "a.b.d", "a.e", "tags"]
    got = {r["id"]: (r["a.b.c"], r["a.b.d"], r["a.e"]) for r in flat.collect()}
    assert got[1] == (7, "x", 2.5)
    assert got[2] == (None, None, 1.0)  # null struct mid-path
    assert got[3] == (None, None, None)  # null at the top
    # underscore separator for sinks that reject dots in identifiers
    assert flatten(df, sep="_").columns == ["id", "a_b_c", "a_b_d", "a_e", "tags"]


def test_dispatch_apply_in_pandas(people):
    import pandas as pd

    def oldest(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(1, "age")[["name", "age"]]

    rows = (
        Pipeline(people.withColumn("g", F.col("age") % 2))
        .dispatch("g", apply_in_pandas=(oldest, "name string, age long"))
        .run()
    )
    assert len(rows) == 2


def test_stats_observe(people, spark):
    p = Pipeline(people).stats("m", F.count(F.lit(1)).alias("n"), F.sum("age").alias("s"))
    rows = p.run()
    assert len(rows) == 3
    stats = p.stat_values()["m"]
    assert stats["n"] == 3 and stats["s"] == 117


def test_fault_propagation_carries_node_name(people):
    p = Pipeline(people, name="badflow").transform(
        lambda df: df.select(F.col("nonexistent_column")), name="BadNode"
    )
    with pytest.raises(PipelineError) as ei:
        p.run()
    assert "BadNode" in str(ei.value)


def test_sink_roundtrip(people, tmp_path):
    path = str(tmp_path / "out")
    Pipeline(people).filter(F.col("age") > 0).sink(path)
    back = people.sparkSession.read.parquet(path)
    assert back.count() == 3


def test_ring_iterate_quiescence(spark):
    # countdown ring: n → n-1 until empty; accumulates all levels
    start = spark.createDataFrame([Row(n=3)])

    def step(df):
        return df.select((F.col("n") - 1).alias("n")).filter(F.col("n") > 0)

    acc = ring_iterate(start, step, max_iters=10)
    assert sorted(r.n for r in acc.collect()) == [1, 2, 3]


def test_exec_time_fault_propagates(people):
    """A17: a failing UDF mid-flow faults the whole pipeline run (not
    just analysis-time errors)."""
    import pandas as pd

    def boom(batches):
        for pdf in batches:
            raise ValueError("worker exploded")
            yield pdf

    p = Pipeline(people, name="FaultyFlow").flat_map(
        lambda df: df.mapInPandas(boom, schema="name string, age long"),
        name="Exploder",
    )
    with pytest.raises(PipelineError) as ei:
        p.run()
    assert "FaultyFlow" in str(ei.value) or "Exploder" in str(ei.value)


def test_monitor_run_report(people):
    """A19: per-node row counts from one pass (observe metrics)."""
    p = (
        Pipeline(people, name="Monitored")
        .monitor()
        .filter(F.col("age") >= 18, name="Adults")
        .transform({"n": F.upper("name")}, name="Upper")
    )
    rows = p.run()
    assert len(rows) == 2
    report = p.run_report()
    assert report == {"Adults": 2, "Upper": 2}


def test_split_null_predicates_route_to_later_branch(spark):
    """A NULL predicate must mean "no match": the row still reaches a
    later matching branch (or the dead-letter), never vanishes."""
    df = spark.createDataFrame(
        [Row(price=None, status="F"), Row(price=400000, status="O"), Row(price=100, status="O")]
    )
    branches = Pipeline(df).split(
        {"big": F.col("price") > 300000, "done": F.col("status") == "F"},
        leftover="rest",
    )
    counts = {k: p.count() for k, p in branches.items()}
    # NULL-price 'F' row lands in 'done', not nowhere
    assert counts == {"big": 1, "done": 1, "rest": 1}
    assert sum(counts.values()) == df.count()


def test_stats_survives_rematerialization(people):
    """Each materialization gets a fresh Observation — a second action
    on the same pipeline must not crash."""
    p = Pipeline(people).stats("m", F.count(F.lit(1)).alias("n"))
    assert p.count() == 3
    rows = p.run()  # second materialization of the same pipeline
    assert len(rows) == 3
    assert p.stat_values()["m"]["n"] == 3
