"""The reference's README walkthrough examples, on this engine.

gridsum/DataflowEx documents four canonical flows (public README):

1. AggregatorFlow — parse ``"a=1&b=2"`` key=value lines, fold a
   per-key sum into shared state.
2. People flow — parse person records, validate, bulk-insert the
   valid ones (DbBulkInserter), route the rest.
3. Broadcaster — one producer cloning every message to N consumers.
4. Crawler ring — a cyclic flow (fetch → extract links → back to
   fetch) with heartbeat-based completion.

Each is re-expressed below on the Pipeline kernel; run this file
directly for a demo, or via tests/test_examples.py.
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from dataflowex_spark.pipeline import Pipeline, ring_iterate


def aggregator_flow(spark: SparkSession, lines: list[str]) -> DataFrame:
    """README AggregatorFlow: "a=1&b=2" → {a: Σ, b: Σ}.

    Shared-state fold becomes explode + groupBy/sum — same result,
    but partitionable to any cluster size.
    """
    df = spark.createDataFrame([Row(line=s) for s in lines])
    return (
        Pipeline(df, name="AggregatorFlow")
        .flat_map(F.split("line", "&"), alias="kv", keep=[])
        .transform(
            {
                "k": F.split(F.col("kv"), "=").getItem(0),
                "v": F.split(F.col("kv"), "=").getItem(1).cast("long"),
            }
        )
        .then(lambda d: d.groupBy("k").agg(F.sum("v").alias("total")))
        .df()
    )


def people_flow(
    spark: SparkSession, people: list[dict], sink_path: str
) -> tuple[int, int]:
    """README people flow: validate → bulk-insert valid, count bad.

    Predicate split (LinkTo/LinkLeftTo) routes invalid rows to a
    dead-letter branch instead of failing the flow.
    """
    df = spark.createDataFrame(
        [Row(name=p.get("name"), age=p.get("age")) for p in people]
    )
    branches = Pipeline(df, name="PeopleFlow").split(
        {"valid": F.col("name").isNotNull() & F.col("age").between(0, 150)},
        leftover="invalid",
    )
    branches["valid"].sink(sink_path)  # the DbBulkInserter stage
    n_valid = spark.read.parquet(sink_path).count()
    n_invalid = branches["invalid"].count()
    return n_valid, n_invalid


def broadcaster(spark: SparkSession, n_branches: int = 3) -> list[int]:
    """README DataBroadcaster: every consumer sees every message."""
    df = spark.createDataFrame([Row(i=i) for i in range(100)])
    branches = Pipeline(df, name="Broadcaster").fan_out(n_branches)
    return [b.count() for b in branches]


def crawler_ring(spark: SparkSession) -> DataFrame:
    """README crawler: a cyclic flow on a toy link graph.

    The ring (fetch → extract → fetch) becomes driver-side iteration
    over a frontier; completion detection (the reference needs a
    heartbeat monitor) is just "frontier is empty". Visited-set
    subtraction keeps the crawl terminating on cyclic graphs.
    """
    edges = spark.createDataFrame(
        [
            Row(src="home", dst="about"),
            Row(src="home", dst="blog"),
            Row(src="blog", dst="post1"),
            Row(src="blog", dst="post2"),
            Row(src="post1", dst="home"),  # cycle back
        ]
    )
    frontier = spark.createDataFrame([Row(url="home")])
    visited = {"home"}

    def fetch_and_extract(fr: DataFrame) -> DataFrame:
        out = (
            fr.join(edges, fr["url"] == edges["src"])
            .select(F.col("dst").alias("url"))
            .distinct()
        )
        new = out.filter(~F.col("url").isin(*visited))
        visited.update(r.url for r in new.collect())
        return new

    return ring_iterate(frontier, fetch_and_extract, max_iters=10)


if __name__ == "__main__":
    from dataflowex_spark.session import get_spark
    import tempfile, os

    spark = get_spark("reference-parity-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    print("— AggregatorFlow —")
    aggregator_flow(spark, ["a=1&b=2", "a=5", "b=3&c=9"]).show()

    print("— PeopleFlow —")
    sink = os.path.join(tempfile.gettempdir(), "people_sink")
    print(
        people_flow(
            spark,
            [
                {"name": "ada", "age": 36},
                {"name": None, "age": 20},
                {"name": "bob", "age": 999},
            ],
            sink,
        )
    )

    print("— Broadcaster —")
    print(broadcaster(spark))

    print("— Crawler ring —")
    crawler_ring(spark).show()
