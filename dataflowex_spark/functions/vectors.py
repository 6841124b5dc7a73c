"""Vector math over ``array<float|double>`` columns.

Built on Spark higher-order functions (``zip_with`` + ``aggregate``):
evaluated JVM-side per row, no Python round-trip, no shuffle. This is
the exact-similarity kernel under the kNN operators.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _d(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — accumulated in double regardless of input width."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """a / ‖a‖₂ — pre-normalizing embeddings turns cosine top-k into
    dot-product top-k (one fewer pass per candidate pair at scale)."""
    n = l2_norm(a)
    return F.transform(_d(a), lambda x: x / n)
