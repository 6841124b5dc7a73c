"""End-to-end corpus-curation pipeline: monotone stage counts,
deterministic rerun, complete train/test partition."""

from examples.corpus_pipeline import curate_corpus


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    report = curate_corpus(
        spark, sf_dir, str(tmp_path / "out"), test_fraction=0.2
    )
    # stages only remove rows
    assert (
        report["ingested"]
        >= report["after_quality"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        >= report["after_decontamination"]
        >= report["after_mixture"]
        > 0
    )
    # split partitions the mixture survivors exactly
    assert (
        report["written_train"] + report["written_test"]
        == report["after_mixture"]
    )
    # packing produced at least one sequence per surviving source
    assert report["train_sequences"] > 0
    # chunking covers every non-empty train doc at least once
    assert report["train_chunks"] >= report["written_train"] > 0
    # deterministic: a rerun reproduces identical counts
    report2 = curate_corpus(
        spark, sf_dir, str(tmp_path / "out2"), test_fraction=0.2
    )
    assert report2 == report
