"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles join-side skew automatically; these
helpers cover the cases AQE doesn't: a groupBy where one hot key
swamps a single reducer, and broadcast-resistant skewed joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


#: phase-2 recombiners by name: how per-salt partials merge.
_COMBINERS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _infer_combiner(expr: Column) -> str:
    """Infer the phase-2 combiner from the expression tree — NOT from
    its string rendering (sum_distinct prints as 'sum(v)', which a
    prefix match happily accepts and then recombines wrongly).

    Walks the unresolved JVM expression: rejects DISTINCT aggregates
    outright, then maps sum→sum, count→sum, min→min, max→max.
    Anything else (avg, first, collect_*, …) is not decomposable by
    per-salt partials and is rejected.
    """
    try:
        node = expr._jc.node()  # ColumnNode (Spark 4 classic)
        cls = node.getClass().getSimpleName()
        if cls == "Alias":
            node = node.child()
            cls = node.getClass().getSimpleName()
        if cls == "UnresolvedFunction":
            fname = str(node.functionName()).lower()
            distinct = bool(node.isDistinct())
        else:
            raise ValueError(
                f"salted_agg cannot infer a combiner for {cls}; "
                "pass an explicit (expr, combiner) pair"
            )
    except ValueError:
        raise
    except Exception as exc:  # JVM reflection drift — demand explicitness
        raise ValueError(
            "salted_agg could not inspect the aggregate expression; "
            "pass an explicit (expr, combiner) pair"
        ) from exc
    if distinct:
        raise ValueError(
            f"salted_agg: {fname} DISTINCT is not decomposable over salts "
            "(per-salt DISTINCT partials double-count across salts)"
        )
    if fname in ("sum", "count"):
        return "sum"
    if fname in ("min", "max"):
        return fname
    raise ValueError(
        f"salted_agg only supports sum/count/min/max; got: {fname}. "
        "Pass an explicit (expr, combiner) pair for other decomposable "
        "aggregates"
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column | tuple[Column, object]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the hot shuffle.

    Phase 1 groups by (keys + random salt) so a hot key spreads over
    ``n_salts`` reducers; phase 2 re-aggregates the per-salt partials.

    ``aggs`` maps output name → either
      - ``(phase1_expr, combiner)`` — the explicit public form;
        ``combiner`` is ``'sum' | 'min' | 'max'`` or a callable
        ``Column -> Column`` applied to the partial column; or
      - a bare phase-1 ``Column`` — convenience only; the combiner is
        inferred from the expression tree and restricted to plain
        sum/count/min/max (DISTINCT and non-decomposable aggregates
        raise).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )

    phase1_exprs: dict[str, Column] = {}
    phase2_exprs: list[Column] = []
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            expr, comb = spec
        else:
            expr, comb = spec, _infer_combiner(spec)
        phase1_exprs[name] = expr
        partial = F.col(f"__p_{name}")
        if callable(comb):
            phase2_exprs.append(comb(partial).alias(name))
        elif comb in _COMBINERS:
            phase2_exprs.append(_COMBINERS[comb](partial).alias(name))
        else:
            raise ValueError(
                f"salted_agg: unknown combiner {comb!r} for {name!r} "
                "(expected 'sum'|'min'|'max' or a callable)"
            )

    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in phase1_exprs.items()]
    )
    return phase1.groupBy(*keys).agg(*phase2_exprs)


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
