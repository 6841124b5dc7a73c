"""Probabilistic record linkage (Fellegi–Sunter, JASA 1969).

The classic entity-resolution decision model: candidate pairs come
from a BLOCKED equi-join (never all-pairs), each pair gets an
agreement vector γ over a handful of field comparisons, and the pair
score is the sum of per-field match weights

    w_i = γ_i ? log(m_i/u_i) : log((1−m_i)/(1−u_i))

with m = P(agree | match), u = P(agree | non-match). Production
linkers (e.g. the public Splink library) quantize these log-ratios
to integers — the decision boundary only needs ordering, and integer
weights make scores engine-exact and shuffle-reduction-order-proof,
so this module takes the weights as integers directly.

Scale shape: the ONLY pair generation is an equi-join on the blocking
key — candidate volume is Σ_b |A_b|·|B_b| (self-link: Σ C(n_b, 2)),
governed by the caller's blocking choice, never n². Comparisons and
scoring are scan-local expressions on the joined frame; thresholds
classify without further shuffles.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# A field comparison: (name, predicate over (left_row, right_row)
# column accessors, integer agree-weight, integer disagree-weight).
Comparison = tuple[
    str,
    Callable[[Callable[[str], Column], Callable[[str], Column]], Column],
    int,
    int,
]


def fellegi_sunter_link(
    a: DataFrame,
    block_cols: Sequence[str],
    comparisons: Sequence[Comparison],
    id_col: str,
    b: DataFrame | None = None,
    match_threshold: int = 40,
    possible_threshold: int = 0,
) -> DataFrame:
    """Score blocked candidate pairs with quantized Fellegi–Sunter
    weights and classify them.

    ``a`` (and ``b`` if linking two sources; omitted ⇒ self-linkage
    with ``id_a < id_b`` canonical pairs) must carry ``id_col``, the
    blocking columns, and every column the comparisons touch. Each
    comparison predicate receives two accessors ``l(col)``/``r(col)``
    returning the left/right side of the pair.

    Returns one row per candidate pair:
    (id_a, id_b, <name>_agree ... , score, classification) with
    classification ∈ {'match','possible','non_match'} by the integer
    thresholds. Everything after the blocking join is scan-local.
    """
    lft = a.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[
            F.col(c).alias(f"__l_{c}")
            for c in a.columns
            if c != id_col
        ],
    )
    rgt = (b if b is not None else a).select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"__bk_{c}") for c in block_cols],
        *[
            F.col(c).alias(f"__r_{c}")
            for c in (b if b is not None else a).columns
            if c != id_col
        ],
    )
    pairs = lft.join(rgt, [f"__bk_{c}" for c in block_cols])
    if b is None:
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))

    def l(col: str) -> Column:  # noqa: E743 — paired accessor naming
        return F.col(f"__l_{col}")

    def r(col: str) -> Column:
        return F.col(f"__r_{col}")

    flags = [
        (name, pred(l, r).alias(f"{name}_agree"))
        for name, pred, _wa, _wd in comparisons
    ]
    scored = pairs.select("id_a", "id_b", *[c for _n, c in flags])
    score = sum(
        (
            F.when(F.col(f"{name}_agree"), F.lit(wa)).otherwise(F.lit(wd))
            for name, _p, wa, wd in comparisons
        ),
        F.lit(0),
    )
    return scored.withColumn("score", score).withColumn(
        "classification",
        F.when(F.col("score") >= match_threshold, F.lit("match"))
        .when(F.col("score") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )


def golden_records(
    records: DataFrame,
    entity_col: str,
    priority_col: str = "priority",
    first_non_null: Sequence[str] = (),
    mode: Sequence[str] = (),
    maximum: Sequence[str] = (),
) -> DataFrame:
    """SURVIVORSHIP — the step after linkage: collapse each matched
    entity's record cluster (q310 pairs → clusters) into ONE golden
    record by per-attribute rules:

    - ``first_non_null``: value from the highest-priority source that
      actually has one (min ``priority_col`` among non-null rows) —
      the trust-ladder rule for identifiers like phone/name;
    - ``mode``: most frequent non-null value across the cluster,
      ties to the smallest value — the consensus rule for categorical
      attributes;
    - ``maximum``: numeric max — the freshest-balance style rule.

    All rules are order-free aggregates (struct-argmin for the trust
    ladder, two-level count+argmin for mode), so the result is
    engine-exact and deterministic under any partitioning — one hash
    aggregate per rule family keyed by entity, clusters never
    collect. Returns one row per entity + ``n_records``."""
    aggs = [F.count("*").cast("long").alias("n_records")]
    for c in first_non_null:
        aggs.append(
            F.min(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.col(priority_col).alias("p"), F.col(c).alias("v")
                    ),
                )
            )["v"].alias(c)
        )
    for c in maximum:
        aggs.append(F.max(c).alias(c))
    base = records.groupBy(entity_col).agg(*aggs)
    for c in mode:
        counts = (
            records.filter(F.col(c).isNotNull())
            .groupBy(entity_col, c)
            .agg(F.count("*").alias("__cnt"))
        )
        pick = counts.groupBy(entity_col).agg(
            F.min(
                F.struct(
                    (-F.col("__cnt")).alias("nc"), F.col(c).alias("v")
                )
            )["v"].alias(c)
        )
        base = base.join(pick, entity_col, "left")
    return base


def comparison_patterns(
    pairs: DataFrame, fields: list[str]
) -> DataFrame:
    """Fold candidate-pair comparison vectors (0/1 agreement columns)
    into (pattern, c) counts — pattern is the bitmask Σ 2^i·γ_i. The
    ONLY row-scale step of weight estimation: one hash aggregate to
    ≤2^k rows, after which EM is driver arithmetic. Returns
    (pattern int, c long)."""
    k = len(fields)
    if k > 20:
        raise ValueError("2^k patterns; quantize comparisons (k ≤ 20)")
    expr = None
    for i, f in enumerate(fields):
        term = F.when(F.col(f) == 1, 1 << i).otherwise(0)
        expr = term if expr is None else expr + term
    return (
        pairs.select(expr.cast("int").alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def fellegi_sunter_em(
    patterns: list[tuple[int, int]],
    k: int,
    iters: int = 60,
    lam0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
) -> dict:
    """EM for the Fellegi–Sunter mixture (Winkler 1988; the Splink
    `estimate_parameters_using_expectation_maximisation` semantics,
    from scratch): unlabeled comparison-pattern counts → per-field
    match/non-match agreement probabilities m_i, u_i and the match
    proportion λ.

    Driver-side by design: the input is the ≤2^k (pattern, count)
    table — the q369/q391 hybrid-cutover rule. Deterministic: fixed
    init, fixed iteration count, fixed field order; the observed-data
    log-likelihood is returned per iteration and is non-decreasing
    (EM guarantee — pytest-pinned). Degenerate fields clamp to
    [1e-6, 1−1e-6] so weights stay finite.

    Returns {lam, m: [k], u: [k], ll: [iters],
    weights: [(agree_w_i, disagree_w_i)]} with weights in log2
    (the Fellegi–Sunter score a pair sums: Σ γ·agree + (1−γ)·
    disagree)."""
    import math

    eps = 1e-6
    lam, m, u = lam0, [m0] * k, [u0] * k
    ll_trace: list[float] = []
    n_tot = sum(c for _, c in patterns)
    if n_tot == 0:
        raise ValueError("no comparison patterns")
    for _ in range(iters):
        ll = 0.0
        s_w = 0.0
        s_wg = [0.0] * k
        s_v = 0.0
        s_vg = [0.0] * k
        for pat, c in patterns:
            pm = lam
            pu = 1.0 - lam
            for i in range(k):
                g = (pat >> i) & 1
                pm *= m[i] if g else (1.0 - m[i])
                pu *= u[i] if g else (1.0 - u[i])
            tot = pm + pu
            ll += c * math.log(max(tot, 1e-300))
            w = pm / tot if tot > 0 else 0.0
            s_w += c * w
            s_v += c * (1.0 - w)
            for i in range(k):
                if (pat >> i) & 1:
                    s_wg[i] += c * w
                    s_vg[i] += c * (1.0 - w)
        ll_trace.append(ll)
        lam = min(max(s_w / n_tot, eps), 1.0 - eps)
        m = [
            min(max(s_wg[i] / s_w, eps), 1.0 - eps) if s_w > 0 else m[i]
            for i in range(k)
        ]
        u = [
            min(max(s_vg[i] / s_v, eps), 1.0 - eps) if s_v > 0 else u[i]
            for i in range(k)
        ]
    weights = [
        (
            math.log2(m[i] / u[i]),
            math.log2((1.0 - m[i]) / (1.0 - u[i])),
        )
        for i in range(k)
    ]
    return {"lam": lam, "m": m, "u": u, "ll": ll_trace, "weights": weights}
