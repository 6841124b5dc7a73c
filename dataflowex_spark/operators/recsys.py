"""Collaborative filtering: ALTERNATING LEAST SQUARES matrix
factorization as a pure DataFrame algorithm (reference parity: none —
this is part of the LLM/ML-data north star, the recommender sibling
of the embedding family; the shape is the classic distributed ALS of
Zhou et al. 2008 as implemented by every large-scale engine).

Scale shape (the part that matters at 100 TB of interactions):

- The RATINGS matrix is the big data; it shuffles exactly twice per
  iteration — keyed by item to pick up the item factors, then keyed
  by user for the per-user solves (and mirrored for the item half).
- The FACTOR frames are (n_entities × rank) — distributed, joined by
  key, never collected and never broadcast by assumption (Catalyst
  broadcasts them when small enough; at web scale they stay
  shuffle-joined).
- Each solve is a rank×rank normal-equation system per entity inside
  ``applyInPandas`` (Arrow-batched, one numpy ``solve`` per group) —
  rank is 4–200 in practice, so the per-entity work is constant and
  the whole step is embarrassingly parallel.

Determinism: factor init is the portable md5-to-unit-interval draw
(no RNG state), each group's rows are sorted by the opposite id
before the normal equations are assembled, and every iteration is a
full sweep — reruns reproduce the factors bit-for-bit on a machine
(pytest pins run-to-run equality and recovery of a planted low-rank
structure)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DRIVER_RATINGS_BOUND = 500_000
"""Ratings-count gate for the driver ALS sweeps — a property of
the DATA (measured row count), never of core count; tests lower
it to force the distributed branch (branch parity)."""


def _init_factors(ids: DataFrame, id_col: str, rank: int) -> DataFrame:
    """Deterministic factor init: component k of entity e is the
    60-bit md5 bucket of "e:k" scaled to [0, 1) — the q155/q92
    portable-draw idiom, so the starting point (hence the whole
    trajectory) is reproducible with no RNG state anywhere."""
    comps = [
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{k}"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(1 << 60))
        )
        for k in range(rank)
    ]
    return ids.select(id_col, F.array(*comps).alias("vec"))


def _solve_half(
    ratings: DataFrame,
    fixed: DataFrame,
    solve_col: str,
    fixed_col: str,
    rating_col: str,
    rank: int,
    reg: float,
) -> DataFrame:
    """One ALS half-sweep: with ``fixed_col``'s factors frozen, solve
    the regularized normal equations for every ``solve_col`` entity:
    x_e = (Vᵀ V + λ·n_e·I)⁻¹ Vᵀ r  over e's interactions."""
    import numpy as np
    import pandas as pd

    joined = ratings.join(
        fixed.withColumnRenamed("vec", "__fvec"), fixed_col
    ).select(solve_col, fixed_col, rating_col, "__fvec")

    schema = f"{solve_col} long, vec array<double>"

    # mapInPandas over a key-repartitioned frame, NOT per-group
    # applyInPandas: with millions of small entities the per-group
    # Arrow/pandas call overhead dominates (measured ~60 s for 15k
    # users at rank 4 — flat in entity count because it is overhead,
    # not math). One partition-level pass with numpy-only group loops
    # does the identical arithmetic at ~10 µs/entity. Each entity's
    # rows land in one partition (hash repartition on the solve key);
    # rows sort by (key, fixed id) so the summation order — hence the
    # floats — match the per-group form bit-for-bit.
    def solve_partition(batches):
        keys, fids, rs, vecs = [], [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys.append(pdf[solve_col].to_numpy(np.int64))
            fids.append(pdf[fixed_col].to_numpy(np.int64))
            rs.append(pdf[rating_col].to_numpy(np.float64))
            vecs.append(np.array(pdf["__fvec"].tolist(), np.float64))
        if not keys:
            return
        k = np.concatenate(keys)
        f = np.concatenate(fids)
        r = np.concatenate(rs)
        V = np.vstack(vecs)
        order = np.lexsort((f, k))
        k, r, V = k[order], r[order], V[order]
        uk, starts = np.unique(k, return_index=True)
        bounds = np.append(starts, len(k))
        eye = np.eye(rank)
        out = []
        for i in range(len(uk)):
            s, e = bounds[i], bounds[i + 1]
            Vg = V[s:e]
            A = Vg.T @ Vg + reg * (e - s) * eye
            b = Vg.T @ r[s:e]
            out.append(np.linalg.solve(A, b).tolist())
        yield pd.DataFrame({solve_col: uk, "vec": out})

    return joined.repartition(solve_col).mapInPandas(
        solve_partition, schema
    )


def als(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    rank: int = 8,
    iters: int = 5,
    reg: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """Alternating least squares: returns (user_factors,
    item_factors), each (id, vec array<double>[rank]).

    A declared pandas operator (the rank×rank solves are the honest
    Python boundary); everything around the solves — joins, shuffles,
    the prediction dot product — is JVM-side. ``ratings`` should be
    pre-aggregated to one row per (user, item).

    Bounded ratings matrices run the sweeps on the driver with numpy
    (the house bounded-state pattern — pagerank rounds, PQ audits,
    k-center): 2·iters checkpointed mapInPandas sweeps of fixed
    per-job overhead otherwise move KBs of factors. The driver path
    replays the SAME md5 init and the SAME sorted-group normal
    equations with the same numpy calls in the same fold order, so
    the factors are bit-identical — pinned by
    tests/test_recsys.py::test_als_driver_matches_distributed. Above
    the bound the distributed loop runs unchanged (ratings never
    collect at scale)."""
    ratings = ratings.select(user_col, item_col, rating_col).localCheckpoint(
        eager=True
    )
    if ratings.count() <= DRIVER_RATINGS_BOUND:
        return _als_driver(
            ratings, user_col, item_col, rating_col, rank, iters, reg
        )
    return _als_dist(
        ratings, user_col, item_col, rating_col, rank, iters, reg
    )


def _als_dist(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int,
    iters: int,
    reg: float,
) -> tuple[DataFrame, DataFrame]:
    item_f = _init_factors(
        ratings.select(item_col).distinct(), item_col, rank
    ).localCheckpoint(eager=True)
    user_f = None
    for _ in range(iters):
        user_f = _solve_half(
            ratings, item_f, user_col, item_col, rating_col, rank, reg
        ).localCheckpoint(eager=True)
        item_f = _solve_half(
            ratings, user_f, item_col, user_col, rating_col, rank, reg
        ).localCheckpoint(eager=True)
    return user_f, item_f


def _als_driver(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int,
    iters: int,
    reg: float,
) -> tuple[DataFrame, DataFrame]:
    """numpy replay of the distributed sweeps — identical md5 init,
    (key, fixed-id) row order, Vᵀ V + λ n I assembly and
    np.linalg.solve per entity, so factors match bit-for-bit (see
    als docstring). One bounded collect, zero Spark jobs in the
    math."""
    import hashlib

    import numpy as np

    from dataflowex_spark.plans import local_rows_df

    spark = ratings.sparkSession
    pdf = ratings.toPandas()
    u = pdf[user_col].to_numpy(np.int64)
    it = pdf[item_col].to_numpy(np.int64)
    rt = pdf[rating_col].to_numpy(np.float64)

    def md5_init(ids):
        # component k of entity e = 60-bit md5 bucket of "e:k" in
        # [0, 1) — the exact arithmetic of _init_factors (string
        # md5 -> first 15 hex chars -> decimal -> double / 2^60)
        return np.array(
            [
                [
                    int(
                        hashlib.md5(f"{e}:{k}".encode()).hexdigest()[:15],
                        16,
                    )
                    / float(1 << 60)
                    for k in range(rank)
                ]
                for e in ids
            ],
            np.float64,
        )

    # factor state is (sorted unique ids, id×rank matrix); rows are
    # gathered by dense searchsorted index — same float64 values as
    # the dict/vstack form, just a vectorized lookup
    def solve_half(k, f, r, fixed_ids, fixed_m):
        # rows sorted by (key, fixed id) exactly as the partition
        # path's lexsort; same Vᵀ V accumulation and solve
        order = np.lexsort((f, k))
        kk, ff, rr = k[order], f[order], r[order]
        V = fixed_m[np.searchsorted(fixed_ids, ff)]
        uk, starts = np.unique(kk, return_index=True)
        bounds = np.append(starts, len(kk))
        eye = np.eye(rank)
        out = np.empty((len(uk), rank), np.float64)
        for i in range(len(uk)):
            s, e = bounds[i], bounds[i + 1]
            Vg = V[s:e]
            A = Vg.T @ Vg + reg * (e - s) * eye
            b = Vg.T @ rr[s:e]
            out[i] = np.linalg.solve(A, b)
        return uk, out

    item_ids = np.unique(it)
    item_m = md5_init(item_ids)
    user_ids = user_m = None
    for _ in range(iters):
        user_ids, user_m = solve_half(u, it, rt, item_ids, item_m)
        item_ids, item_m = solve_half(it, u, rt, user_ids, user_m)

    def frame(ids, m, id_col):
        return local_rows_df(
            spark,
            [
                (int(e), [float(x) for x in m[i]])
                for i, e in enumerate(ids)
            ],
            f"{id_col} long, vec array<double>",
        )

    return frame(user_ids, user_m, user_col), frame(
        item_ids, item_m, item_col
    )


def predict(
    user_f: DataFrame,
    item_f: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
) -> DataFrame:
    """Score every (user, item) pair by the factor dot product —
    JVM-side ``zip_with``/``aggregate`` HOFs, no Python in the scoring
    path (the q82/q145 array idiom). Cross-joining all pairs is the
    caller's choice; for top-k serving, join against a candidate set
    instead."""
    u = user_f.withColumnRenamed("vec", "__uv")
    i = item_f.withColumnRenamed("vec", "__iv")
    dot = F.aggregate(
        F.zip_with("__uv", "__iv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return u.crossJoin(i).select(
        user_col, item_col, dot.alias("score")
    )
