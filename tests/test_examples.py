"""The reference README examples must actually run and give the
documented results."""

from examples.reference_parity import (
    aggregator_flow,
    broadcaster,
    crawler_ring,
    people_flow,
)


def test_aggregator_flow(spark):
    out = {r.k: r.total for r in aggregator_flow(spark, ["a=1&b=2", "a=5", "b=3&c=9"]).collect()}
    assert out == {"a": 6, "b": 5, "c": 9}


def test_people_flow(spark, tmp_path):
    n_valid, n_invalid = people_flow(
        spark,
        [
            {"name": "ada", "age": 36},
            {"name": None, "age": 20},
            {"name": "bob", "age": 999},
        ],
        str(tmp_path / "sink"),
    )
    assert (n_valid, n_invalid) == (1, 2)


def test_broadcaster_delivers_to_all(spark):
    assert broadcaster(spark, 3) == [100, 100, 100]


def test_crawler_ring_terminates_on_cycle(spark):
    urls = sorted(r.url for r in crawler_ring(spark).collect())
    assert urls == ["about", "blog", "home", "post1", "post2"]
