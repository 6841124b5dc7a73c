"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles join-side skew automatically; these
helpers cover the cases AQE doesn't: a groupBy where one hot key
swamps a single reducer, and broadcast-resistant skewed joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the hot shuffle.

    Phase 1 groups by (keys + random salt) so a hot key spreads over
    ``n_salts`` reducers; phase 2 re-aggregates the per-salt partials.
    ``aggs`` maps output name → phase-1 aggregate expression; phase 2
    re-combines with the matching combiner (sum→sum, count→sum,
    min→min, max→max) inferred from the expression name, so only
    decomposable aggregates are allowed.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def combiner(name: str, expr: Column) -> Column:
        op = expr._jc.toString()  # e.g. "count(1) AS `__p_n`"
        col = F.col(f"__p_{name}")
        if op.startswith("min("):
            return F.min(col).alias(name)
        if op.startswith("max("):
            return F.max(col).alias(name)
        if op.startswith("sum(") or op.startswith("count(1"):
            # sum/count(*) partials both recombine by summation
            return F.sum(col).alias(name)
        # avg, countDistinct, first, … are NOT decomposable this way —
        # summing their partials silently produces garbage
        raise ValueError(
            f"salted_agg only supports sum/count(*)/min/max; got: {op}"
        )

    return phase1.groupBy(*keys).agg(
        *[combiner(name, expr) for name, expr in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the (big, skewed) left
    side and replicate the right side across all salts. Use when the
    right side is too big to broadcast and AQE's skew splitting can't
    kick in (e.g. pre-shuffled inputs). Replication factor = n_salts —
    size the salt count to the skew, not higher."""
    l = left.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    r = right.withColumn("__salt", salts)
    out = l.join(r, on=[on, "__salt"], how=how)
    return out.drop("__salt")
