"""Sampling & splitting for training-data pipelines.

Deterministic by construction: splits key off a hash of a stable id,
never off row order or RNG state, so reruns and backfills land every
row in the same split — the property that matters when the corpus is
100 TB and the split must be reproducible across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.2,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic hash split: bucket = xxhash64(id, seed) mod 10k;
    rows below the cut are 'test'. Same id → same split, forever,
    regardless of partitioning, ordering, or cluster size."""
    cut = int(test_fraction * 10_000)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    return df.withColumn(
        split_col, F.when(bucket < cut, "test").otherwise("train")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): keeps each class at
    its own rate — the class-balance tool for training corpora. Scan-
    side filter, no shuffle."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def deterministic_downsample(
    df: DataFrame,
    id_col: str,
    keep_one_in: int,
    seed: int = 42,
) -> DataFrame:
    """Keep every id whose hash falls in 1/keep_one_in of the space —
    the reproducible alternative to ``df.sample`` for corpus
    downsampling (a row's fate never depends on which partition or
    run it appeared in)."""
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(keep_one_in)) == 0
    )
