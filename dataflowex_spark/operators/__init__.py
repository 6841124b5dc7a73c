"""Operator library — reference-parity ETL ops + Spark-native
relational/streaming/LLM-data extensions (SURVEY.md §2)."""

from dataflowex_spark.operators.etl import (
    dim_join,
    dim_join_insert_missing,
    shard_assign,
    sharded_sink,
)
from dataflowex_spark.operators.joins import asof_join, range_join
from dataflowex_spark.operators.windows import sessionize, top_k_per_group
from dataflowex_spark.operators.dedup import (
    dedup_exact,
    decontaminate,
    dedup_minhash_lsh,
    dedup_minhash_mllib,
    minhash_lsh_cross,
    dedup_simhash,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from dataflowex_spark.operators.similarity import (
    knn_cosine_exact,
    knn_cosine_ivf,
    knn_cosine_lsh,
)
from dataflowex_spark.operators.text import (
    language_id,
    text_stats,
    tf_idf,
)
from dataflowex_spark.operators.skew import salted_agg, salted_join
from dataflowex_spark.operators.sampling import (
    deterministic_downsample,
    stratified_sample,
    train_test_split,
)
from dataflowex_spark.operators import multimodal

__all__ = [
    "dim_join",
    "dim_join_insert_missing",
    "shard_assign",
    "sharded_sink",
    "asof_join",
    "range_join",
    "sessionize",
    "top_k_per_group",
    "dedup_exact",
    "decontaminate",
    "dedup_minhash_lsh",
    "dedup_minhash_mllib",
    "minhash_lsh_cross",
    "dedup_simhash",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "knn_cosine_exact",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "language_id",
    "text_stats",
    "tf_idf",
    "salted_agg",
    "salted_join",
    "deterministic_downsample",
    "stratified_sample",
    "train_test_split",
    "multimodal",
]
