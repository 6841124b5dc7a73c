"""Frequent-itemset mining (market-basket analysis) as distributed
joins — the Apriori lattice walk re-expressed Spark-first.

Public background: Agrawal–Srikant's Apriori (VLDB'94) and the
SON partition algorithm (Savasere–Omiecinski–Navathe, VLDB'95).
DataflowEx has no mining surface; this extends the engine's
analytics family (q182's pairwise lift generalized to itemsets).

Plan shape, per level k:

- the (basket, item) frame is DISTINCT'd once and filtered to
  frequent 1-items via a BROADCAST semi-join (L1 is small by the
  support threshold — at most 1/θ items can be frequent);
- candidate k-sets are generated WITHIN a basket by equi-joining on
  the basket key with an item-order predicate (i1 < i2 < …), so the
  only shuffle is on the basket key and the join never leaves a
  basket;
- Apriori pruning is applied BEFORE counting: every candidate's
  (k−1)-subsets must be frequent, enforced with broadcast semi-joins
  against L(k−1) — the candidate stream that reaches the counting
  shuffle is support-bounded, not basket-size-cubed.

At 100 TB: support θ bounds |Lk| ≤ C(1/θ·…) so every Lk broadcasts;
the heavy frame (basket items) shuffles ONCE on the basket key and
is reused across levels; the SON alternative (per-partition local
Apriori producing candidates, then one exact global count) drops the
basket shuffle entirely at the cost of a candidate union — both are
candidate-volume-linear, never all-pairs. Results are EXACTLY the
support-θ itemsets either way, which is why the DuckDB oracle may
brute-force enumerate subsets: pruning changes cost, never answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_itemsets(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    max_size: int = 3,
) -> DataFrame:
    """Itemsets of size 1..max_size (≤3) with support ≥ min_support
    (absolute basket count). Returns (itemset, k, s): the itemset as
    a '|'-joined ascending string, its size, and its support."""
    if max_size < 1 or max_size > 3:
        raise ValueError("max_size must be 1, 2, or 3")
    # materialize the deduped (basket, item) frame ONCE — every level
    # (L1, pairs, triples) reads it, and without the checkpoint each
    # reference re-scans and re-shuffles the source (the plan showed
    # 46 scans / 82 exchanges for the 3-level walk; now the levels
    # share one materialization and shuffle only on the basket key)
    bi = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    l1 = (
        bi.groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    out = l1.select(
        F.col("i").cast("string").alias("itemset"),
        F.lit(1).alias("k"),
        "s",
    )
    if max_size == 1:
        return out

    keep = bi.join(F.broadcast(l1.select("i")), "i").select("b", "i")
    pairs = (
        keep.alias("x")
        .join(
            keep.alias("y"),
            (F.col("x.b") == F.col("y.b")) & (F.col("x.i") < F.col("y.i")),
        )
        .select(
            F.col("x.b").alias("b"),
            F.col("x.i").alias("i1"),
            F.col("y.i").alias("i2"),
        )
    )
    l2 = (
        pairs.groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    out = out.unionByName(
        l2.select(
            F.concat_ws(
                "|", F.col("i1").cast("string"), F.col("i2").cast("string")
            ).alias("itemset"),
            F.lit(2).alias("k"),
            "s",
        )
    )
    if max_size == 2:
        return out

    # Apriori prune BEFORE the counting shuffle: a candidate triple
    # survives only if all three 2-subsets are frequent
    l2k = F.broadcast(l2.select("i1", "i2"))
    freq_pairs = pairs.join(l2k, ["i1", "i2"])  # (i1,i2) frequent
    tri = (
        freq_pairs.alias("p")
        .join(
            keep.alias("z"),
            (F.col("p.b") == F.col("z.b")) & (F.col("z.i") > F.col("p.i2")),
        )
        .select(
            F.col("p.b").alias("b"),
            F.col("p.i1").alias("i1"),
            F.col("p.i2").alias("i2"),
            F.col("z.i").alias("i3"),
        )
        .alias("c")
        .join(
            l2k.alias("s23"),
            (F.col("c.i2") == F.col("s23.i1"))
            & (F.col("c.i3") == F.col("s23.i2")),
            "leftsemi",
        )
        .alias("c")
        .join(
            l2k.alias("s13"),
            (F.col("c.i1") == F.col("s13.i1"))
            & (F.col("c.i3") == F.col("s13.i2")),
            "leftsemi",
        )
    )
    l3 = (
        tri.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    return out.unionByName(
        l3.select(
            F.concat_ws(
                "|",
                F.col("i1").cast("string"),
                F.col("i2").cast("string"),
                F.col("i3").cast("string"),
            ).alias("itemset"),
            F.lit(3).alias("k"),
            "s",
        )
    )


def association_rules(
    itemsets: DataFrame, min_confidence_ppm: int
) -> DataFrame:
    """1-consequent rules from the (itemset,k,s) frame: for each
    frequent pair {a,b}, rules a→b and b→a with integer-exact
    confidence in ppm (1e6·s(ab)/s(a)); kept when ≥ the threshold.
    Antecedent supports arrive by broadcast (Lk is support-bounded).
    Returns (antecedent, consequent, s, conf_ppm)."""
    singles = itemsets.filter(F.col("k") == 1).select(
        F.col("itemset").alias("a"), F.col("s").alias("s_a")
    )
    pairs = itemsets.filter(F.col("k") == 2).select(
        F.split("itemset", r"\|").getItem(0).alias("a"),
        F.split("itemset", r"\|").getItem(1).alias("b"),
        "s",
    )
    both = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "s")
    )
    return (
        both.join(F.broadcast(singles), "a")
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "s",
            F.floor(F.lit(1_000_000) * F.col("s") / F.col("s_a"))
            .cast("long")
            .alias("conf_ppm"),
        )
        .filter(F.col("conf_ppm") >= min_confidence_ppm)
    )
