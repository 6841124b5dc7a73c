"""End-to-end training-corpus pipeline — the engine's operators
composed the way a 100 TB data-curation job would run them:

    ingest → validate → PII scrub → quality filter → exact dedup →
    near-dup clustering (MinHash LSH + connected components) →
    benchmark decontamination (13-gram overlap) →
    source-mixture rebalance → deterministic train/test split →
    sequence packing + context-window chunking (train side) →
    sorted write

Every stage is a DataFrame→DataFrame operator from the library; the
whole pipeline is one lazy plan per output (Catalyst sees everything),
and every decision (dedup winner, split assignment) is deterministic
so a rerun or backfill reproduces the identical corpus.
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.functions.text import quality_score, token_count
from dataflowex_spark.operators.dedup import (
    decontaminate,
    dedup_clusters,
    dedup_exact,
    dedup_minhash_lsh,
)
from dataflowex_spark.operators.packing import pack_sequences
from dataflowex_spark.operators.sampling import (
    rebalance_mixture,
    token_budget_trim,
    train_test_split,
)
from dataflowex_spark.operators.text import scrub_pii
from dataflowex_spark.sources import write_sorted


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_tokens: int = 5,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
    test_fraction: float = 0.1,
    mixture_targets: dict[str, float] | None = None,
    pack_budget: int = 512,
    token_budget: int = 1_000_000,
) -> dict[str, int]:
    """Run the curation pipeline over the documents table; returns
    per-stage row counts (the run report)."""
    from pyspark import StorageLevel

    # The run report COUNTS after every stage while the next stage
    # consumes the same frame: left lazy, each count re-executes the
    # whole upstream chain again (quadratic full passes by the last
    # stage). Persist each multi-consumer stage output
    # (MEMORY_AND_DISK — recomputable, spills, fault-tolerant: the
    # tf_idf discipline) and release everything at the end; every
    # stage then runs ONCE (guide §5 "caching is worth it when a
    # DataFrame is reused and recomputing is more expensive").
    persisted: list[DataFrame] = []

    def mat(df: DataFrame) -> DataFrame:
        persisted.append(df.persist(StorageLevel.MEMORY_AND_DISK))
        return df

    docs = Catalog(spark, sf_dir)["documents"]
    report: dict[str, int] = {"ingested": docs.count()}

    # 0. PII scrub — replace emails/phones BEFORE anything hashes or
    # splits text, so no raw identifier survives into any artifact
    # (same scan stage as the quality pass; no extra job).
    # Persisted: consumed by the quality filter, the repetition gate,
    # and the decontamination benchmark side.
    docs = mat(
        scrub_pii(docs)
        .drop("text", "n_emails", "n_phones")
        .withColumnRenamed("scrubbed", "text")
    )

    # 1. validate + quality filter (single codegen'd scan stage)
    filtered = docs.filter(
        (token_count(F.col("text")) >= min_tokens)
        & (quality_score(F.col("text")) >= min_quality)
    )
    report["after_quality"] = filtered.count()

    # 1b. repetition gate (Gopher screens): drop docs dominated by one
    # word/bigram or mostly-repeated tokens — integer-exact ppm
    # thresholds, one hash-agg pass, flags join back on doc_id
    from dataflowex_spark.operators.text import repetition_stats

    rep_ok = repetition_stats(docs).filter(~F.col("flagged")).select("doc_id")
    filtered = mat(filtered.join(rep_ok, "doc_id", "left_semi"))
    report["after_repetition_gate"] = filtered.count()

    # 2. exact dedup (content hash, min-id winner)
    exact = dedup_exact(filtered)
    report["after_exact_dedup"] = exact.count()

    # 2b. segment-level dedup: cut cross-document boilerplate (first
    # occurrence survives, documents reassemble from their surviving
    # segments — the RefinedWeb paragraph-dedup stage)
    from dataflowex_spark.operators.dedup import dedup_segments

    segs = dedup_segments(exact, seg_tokens=10)
    exact = mat(
        exact.drop("text")
        .join(segs.select("doc_id", "kept_text"), "doc_id")
        .withColumnRenamed("kept_text", "text")
        .filter(F.length("text") > 0)
    )
    report["after_segment_dedup"] = exact.count()

    # 3. near-dup removal: LSH pairs → components → keep canonical
    pairs = dedup_minhash_lsh(
        exact, jaccard_threshold=jaccard_threshold
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    canonical = mat(exact.join(losers, on="doc_id", how="left_anti"))
    report["after_near_dedup"] = canonical.count()

    # 4. benchmark decontamination: drop training docs overlapping the
    # held-out eval set on any 13-gram (src0 stands in for the
    # benchmark; both join sides broadcast — corpus never shuffles)
    bench = docs.filter(F.col("source") == "src0")
    clean = mat(decontaminate(
        canonical.filter(F.col("source") != "src0"), bench, n=13
    ))
    report["after_decontamination"] = clean.count()

    # 5. source-mixture rebalance: even out surviving sources (uniform
    # targets over whatever sources remain — scan-side filter, the
    # corpus still hasn't shuffled)
    sources = [r["source"] for r in clean.select("source").distinct().collect()]
    if mixture_targets is None:
        mixture_targets = {s: 1.0 / len(sources) for s in sources}
    mixed = mat(rebalance_mixture(clean, "source", "doc_id", mixture_targets))
    report["after_mixture"] = mixed.count()

    # 5b. per-source token-budget trim: cap each source's token
    # contribution (longest-first, deterministic) so one verbose
    # source can't dominate the epoch even after count rebalancing
    budgeted = token_budget_trim(
        mixed.withColumn(
            "__n_tok", token_count(F.col("text")).cast("bigint")
        ),
        "source",
        "doc_id",
        "__n_tok",
        budget=token_budget,
    ).drop("__n_tok", "cum_tokens")
    budgeted = mat(budgeted)
    report["after_token_budget"] = budgeted.count()
    mixed = budgeted

    # 6. deterministic split + sorted write (tight row-group stats)
    split = train_test_split(
        mixed, "doc_id", test_fraction=test_fraction
    )
    for name in ("train", "test"):
        part = split.filter(F.col("split") == name).drop("split")
        write_sorted(part, f"{out_dir}/{name}", ["doc_id"], n_files=4)
        report[f"written_{name}"] = spark.read.parquet(f"{out_dir}/{name}").count()

    # 7. sequence packing of the train side: greedy next-fit into
    # fixed-token-budget sequences (padding-waste eliminator); only
    # (source, doc_id, n_tok) crosses Arrow
    train = spark.read.parquet(f"{out_dir}/train")
    packed = pack_sequences(
        train.select(
            "source", "doc_id",
            token_count(F.col("text")).cast("bigint").alias("n_tok"),
        ),
        group_col="source", id_col="doc_id", n_tokens_col="n_tok",
        budget=pack_budget,
    )
    report["train_sequences"] = (
        packed.select("source", "seq_id").distinct().count()
    )

    # 8. context-window chunking of the train side (the alternative
    # consumer shape to packing: fixed windows WITH overlap for
    # models that want boundary context) — scan-local, zero shuffles
    from dataflowex_spark.operators.text import chunk_tokens

    report["train_chunks"] = chunk_tokens(
        train, chunk=128, overlap=16
    ).count()
    for df in persisted:
        df.unpersist()
    return report


if __name__ == "__main__":
    import json
    import tempfile

    from dataflowex_spark.session import get_spark

    spark = get_spark("corpus-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="corpus_out_")
    print(json.dumps(curate_corpus(spark, "/root/testdata/sf0.01", out), indent=2))
