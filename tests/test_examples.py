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


def test_embedding_pipeline_end_to_end(spark, sf_dir, tmp_path):
    """The vector-side pipeline: dedup shrinks the corpus, the IVF
    index answers probes, and recall@10 against exact is high at 4/16
    probe cells on this corpus."""
    from examples.embedding_pipeline import run_embedding_pipeline

    report = run_embedding_pipeline(
        spark, sf_dir, str(tmp_path / "ivf"), n_probes=4
    )
    assert report["after_semantic_dedup"] < report["ingested"]
    assert report["projection_rows"] == report["ingested"] * 8
    assert report["recall_at_k"] >= 0.5
