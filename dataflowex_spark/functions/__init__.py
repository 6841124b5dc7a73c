"""Scalar/array function library (JVM-side, codegen-friendly).

Everything here returns pyspark Column expressions built from
``pyspark.sql.functions`` — no Python UDFs — so they stay inside
whole-stage codegen and vectorized parquet scans at 100 TB scale.
"""

from dataflowex_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
    normalize,
)
from dataflowex_spark.functions.text import (
    bind,
    token_count,
    tokens,
    char_ngrams,
    word_shingles,
    quality_score,
    rolling_fingerprint,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "normalize",
    "bind",
    "token_count",
    "tokens",
    "char_ngrams",
    "word_shingles",
    "quality_score",
    "rolling_fingerprint",
]
