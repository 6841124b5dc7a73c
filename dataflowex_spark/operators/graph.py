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
