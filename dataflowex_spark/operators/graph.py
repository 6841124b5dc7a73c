"""Iterative graph algorithms on DataFrames — the driver-loop +
distributed-data pattern (reference parity: cyclic ring flows,
SURVEY §2 A18) applied to a real fixed-point computation.

Scale shape: each iteration is one keyed join + one keyed aggregate —
ranks and edges shuffle on node ids, nothing funnels to the driver
(the only driver-side values are the node count and the loop
counter). ``localCheckpoint`` every few rounds cuts the growing
lineage, the standard trade for driver-loop iteration (same as
``dedup_clusters``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "p",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count (deterministic —
    no convergence test, so any engine replaying the same arithmetic
    reproduces it; the DuckDB oracle unrolls the loop as chained
    CTEs).

    ``weight_col`` must hold out-normalized edge weights (sum to 1 per
    source). Teleport and damping are spelled as the same literal
    expression tree the oracle uses, keeping even the IEEE rounding
    identical. Returns (node, r).
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n = nodes.count()  # graph cardinality, not data volume
    teleport = (F.lit(1.0) - F.lit(damping)) / F.lit(n)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n)).alias("r"))
    for i in range(iters):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["node"])
            .groupBy(F.col(dst_col).alias("node"))
            .agg(F.sum(F.col(weight_col) * F.col("r")).alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                teleport
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Count triangles in an undirected graph given as an edge list
    (direction and duplicates ignored; self-loops dropped). Returns a
    single row (n_edges, n_triangles).

    Plan: canonicalize every edge to (a < b) and dedup, then enumerate
    each triangle exactly once as a < b < c via two equi-joins —
    e(a,b) ⋈ e(b,c) on the middle node, verified against e(a,c).
    Id-ordering makes each triangle appear once with zero post-dedup.

    Scale note: the e⋈e join's intermediate is Σ_b deg(b)² — fine for
    sparse graphs, dominated by hub nodes on skewed ones. The standard
    refinement (orient each edge low-degree → high-degree node before
    joining, bounding the intermediate by Σ deg(v)·α(G)) composes here
    as a degree-ranked relabel of (a, b) before this function; id
    order is kept as-is because it is oracle-reproducible in ANSI SQL.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return tri.agg(F.count("*").alias("n_triangles")).crossJoin(
        F.broadcast(e.agg(F.count("*").alias("n_edges")))
    ).select("n_edges", "n_triangles")
