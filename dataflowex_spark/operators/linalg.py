"""Distributed dense linear algebra over embedding columns.

The embedding-pipeline primitives that need MORE than per-row math:
the d×d covariance/Gram matrix of an ``array<float>`` column (the
input to PCA, whitening, Mahalanobis scoring, SemDeDup-style
decorrelation) and the PCA projection itself.

Scale shape — the treeAggregate pattern, not an explode:

- A 100 TB corpus with d=1024 must NOT explode to (row × dᵢ × dⱼ)
  pairs (a 10⁶× row blowup through a shuffle). Instead each Arrow
  batch computes its PARTIAL ``XᵀX`` (and coordinate sums) in one
  BLAS call via ``mapInPandas``; only d·(d+1)/2-sized partials cross
  the wire, and one hash aggregation sums them. The shuffle volume
  is ``#batches · d²/2`` regardless of row count.
- The final d×d matrix is tiny by construction, so eigendecomposition
  happens driver-side in numpy and the component matrix travels back
  BROADCAST for the projection pass — again one mapInPandas BLAS
  multiply, no shuffle at all.
- Eigenvector sign is canonicalized (largest-|coordinate| made
  positive) so results are deterministic across LAPACK builds.

Reference parity: gridsum/DataflowEx has no numeric surface at all
[R: Gridsum.DataflowEx/Dataflow.cs — block plumbing only]; this
module is part of the LLM-pipeline addendum (SURVEY.md §2 Part B).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

_PARTIAL_SCHEMA = "i int, j int, s double"


def _partial_gram(vec_col: str):
    """mapInPandas kernel: per-batch partial XᵀX (upper triangle),
    per-coordinate sums (j = -1) and row count (i = j = -1)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = X.shape[1]
            G = X.T @ X
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(d), [-1]]).astype(
                        "int32"
                    ),
                    "j": np.concatenate(
                        [ju, np.full(d, -1), [-1]]
                    ).astype("int32"),
                    "s": np.concatenate(
                        [G[iu, ju], X.sum(axis=0), [float(len(X))]]
                    ),
                }
            )

    return gen


def gram_sums(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Aggregated partials: rows ``(i, j, s)`` where ``j >= 0`` holds
    Σ xᵢxⱼ for the upper triangle, ``j = -1`` holds Σ xᵢ, and
    ``i = j = -1`` holds the row count. One narrow mapInPandas pass +
    one hash aggregation keyed on (i, j)."""
    partials = df.select(vec_col).mapInPandas(
        _partial_gram(vec_col), schema=_PARTIAL_SCHEMA
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        # referenced three ways downstream (products / means / count);
        # without the checkpoint each reference re-runs the Python pass
        .localCheckpoint(eager=False)
    )


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Sample (biased, ÷n) covariance matrix of an array column as an
    upper-triangle frame ``(i, j, cov)`` with 0-based coordinates.

    cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n) — assembled from one
    :func:`gram_sums` pass; the means frame is d rows and travels
    broadcast."""
    sums = gram_sums(df, vec_col)
    n = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("__n")
    )
    means = sums.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("__k"), F.col("s").alias("__sv")
    )
    prods = sums.filter(F.col("j") >= 0)
    cov = (
        prods.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(means).withColumnRenamed("__k", "i").withColumnRenamed(
                "__sv", "__si"
            ),
            "i",
        )
        .join(
            F.broadcast(means).withColumnRenamed("__k", "j").withColumnRenamed(
                "__sv", "__sj"
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("s") / F.col("__n")
                - (F.col("__si") / F.col("__n"))
                * (F.col("__sj") / F.col("__n"))
            ).alias("cov"),
        )
    )
    if round_digits is not None:
        # + 0.0 flushes IEEE negative zero to +0.0: a rounded -1e-9
        # renders '-0.0' and hash-mismatches the oracle's '0.0'.
        cov = cov.withColumn(
            "cov", F.round("cov", round_digits) + F.lit(0.0)
        )
    return cov.orderBy("i", "j")


def pca_components(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal components from the distributed covariance:
    returns ``(eigenvalues[k], components[d, k])``, eigenvalues
    descending, each component's largest-|coordinate| forced positive
    (deterministic across LAPACK builds up to eigenvalue ties)."""
    rows = covariance_matrix(df, vec_col).collect()
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        if vecs[np.abs(vecs[:, c]).argmax(), c] < 0:
            vecs[:, c] = -vecs[:, c]
    return vals, vecs


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    out_col: str = "pc",
    components: np.ndarray | None = None,
) -> DataFrame:
    """Append the k-dimensional PCA projection as an array column.
    The (d × k) component matrix is closed over (plan-size O(d·k),
    shipped once per task) and the projection is one per-batch BLAS
    multiply — no shuffle, no per-row Python."""
    if components is None:
        _, components = pca_components(df, vec_col, k)
    W = np.ascontiguousarray(components, dtype=np.float64)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = X @ W
            pdf = pdf.copy()
            pdf[out_col] = list(P)
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def ridge_regression(
    df: DataFrame,
    features: list[str],
    target: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
) -> dict:
    """Closed-form ridge regression via the normal equations —
    coefficients = (XᵀX + λI)⁻¹ Xᵀy, with XᵀX and Xᵀy accumulated by
    ONE distributed hash aggregation of plain column products (pure
    JVM codegen — for a handful of named feature columns no Python
    pass is needed; contrast :func:`gram_sums`, which serves the
    wide-array case). The d×d solve happens driver-side; λ is not
    applied to the intercept row, per convention.

    Returns ``{"coef": {feature: β}, "intercept": b, "n": rows}``.
    The only data pass is the single aggregation — at 100 TB this is
    one map-side-combined scan, no shuffle beyond the 1-row final
    combine."""
    cols = list(features) + (["__one"] if fit_intercept else [])
    base = df.select(
        *[F.col(c).cast("double").alias(c) for c in features],
        F.col(target).cast("double").alias("__y"),
    )
    if fit_intercept:
        base = base.withColumn("__one", F.lit(1.0))
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(F.col(a) * F.col(b)).alias(f"__xx_{a}__{b}")
            )
        aggs.append(F.sum(F.col(a) * F.col("__y")).alias(f"__xy_{a}"))
    aggs.append(F.count("*").alias("__n"))
    row = base.agg(*aggs).collect()[0]

    d = len(cols)
    G = np.zeros((d, d))
    v = np.zeros(d)
    for i, a in enumerate(cols):
        for j in range(i, d):
            b = cols[j]
            G[i, j] = G[j, i] = row[f"__xx_{a}__{b}"]
        v[i] = row[f"__xy_{a}"]
    if l2:
        reg = np.eye(d) * l2
        if fit_intercept:
            reg[-1, -1] = 0.0  # don't shrink the intercept
        G = G + reg
    beta = np.linalg.solve(G, v)
    coef = {f: float(b) for f, b in zip(features, beta)}
    intercept = float(beta[-1]) if fit_intercept else 0.0
    return {"coef": coef, "intercept": intercept, "n": int(row["__n"])}


def mahalanobis_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "maha",
    ridge: float = 1e-9,
) -> DataFrame:
    """Squared Mahalanobis distance of every vector from the corpus
    mean — the covariance-aware outlier score (a vector can be close
    to the mean in every coordinate yet wildly improbable under the
    correlation structure; Euclidean distance can't see that).

    Pipeline: one :func:`gram_sums` pass → driver-side mean/covariance
    assembly and pseudo-inverse (d×d; ``ridge`` stabilizes a
    near-singular covariance) → the (μ, Σ⁻¹) pair is closed over
    (O(d²) plan payload) and each Arrow batch scores with two BLAS
    ops. No shuffle in the scoring pass; total data movement is the
    Gram partials."""
    sums = gram_sums(df, vec_col).collect()
    n = next(r["s"] for r in sums if r["i"] == -1 and r["j"] == -1)
    d = max(r["j"] for r in sums if r["j"] >= 0) + 1
    mu = np.zeros(d)
    for r in sums:
        if r["i"] >= 0 and r["j"] == -1:
            mu[r["i"]] = r["s"] / n
    C = np.zeros((d, d))
    for r in sums:
        if r["j"] >= 0:
            v = r["s"] / n - mu[r["i"]] * mu[r["j"]]
            C[r["i"], r["j"]] = C[r["j"], r["i"]] = v
    P = np.linalg.pinv(C + ridge * np.eye(d))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mu
            scores = np.einsum("ij,jk,ik->i", X, P, X)
            pdf = pdf.copy()
            pdf[out_col] = scores
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)
