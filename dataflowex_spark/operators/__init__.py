"""Operator library — reference-parity ETL ops + Spark-native
relational/LLM-data extensions (SURVEY.md §2)."""

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
    dedup_minhash_lsh,
    dedup_simhash,
    ngram_jaccard_pairs,
)
from dataflowex_spark.operators.similarity import knn_cosine_exact, knn_cosine_lsh

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
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "knn_cosine_exact",
    "knn_cosine_lsh",
]
