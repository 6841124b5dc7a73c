"""Model-evaluation and distribution-drift statistics.

A training-data pipeline does not stop at producing features — it has
to SCORE what it produced: did the heuristic quality classifier
actually separate good from bad documents (AUC), are its scores
calibrated (reliability table), did this week's crawl drift from last
week's (Kolmogorov–Smirnov), and how much does one column tell you
about another (mutual information / entropy)? These are the standard
offline-eval primitives, each implemented as a pure DataFrame plan.

Scale discipline shared by all four:

- Every statistic is computed over a COMPACTED frame first — one
  hash aggregation keyed on the distinct score / value / category —
  so the ordered pass that follows runs over ``#distinct buckets``
  rows, not ``#input`` rows. The ordered pass itself is
  :func:`~dataflowex_spark.operators.windows.global_cumsum` (range-
  partitioned parallel prefix sums, zero unpartitioned WindowExec
  nodes — plan-audited), so even a CONTINUOUS double score, where
  compaction buys nothing, degrades to a parallel sort rather than a
  single-reducer window. Quantizing the score upstream remains the
  cheap path (smaller shuffles) but is no longer a correctness-of-
  scale contract the caller must remember.
- Rank arithmetic is integer cross-multiplication (``c1*n2 - c2*n1``
  style) up to the single final division, so engine float summation
  order cannot perturb the result below the rounding digit.
- Marginal frames (class totals, per-category counts) are bounded by
  cardinality, joined via ``F.broadcast``.

Reference parity: gridsum/DataflowEx ships aggregation blocks but no
statistics library [R: Gridsum.DataflowEx/DataflowEx.csproj — no eval
surface]; this module is part of the LLM-pipeline addendum the
engine adds on top (SURVEY.md §2 Part B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from dataflowex_spark.operators.windows import global_cumsum, global_ntile


def roc_auc(
    df: DataFrame,
    label: Column,
    score: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Tie-aware ROC AUC (Mann–Whitney U form) as a 1-row frame
    ``(auc, n_pos, n_neg)``.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed
    exactly: aggregate to one ``(pos, neg)`` pair per DISTINCT score,
    order scores ascending, and credit each bucket
    ``pos · (2·cum_neg_below + neg)`` half-pairs. All counts are
    integers; the one division happens at the end.

    The ordered prefix runs over distinct scores via
    :func:`~dataflowex_spark.operators.windows.global_cumsum` — a
    range-partitioned parallel pass, so a continuous double score
    (distinct count ≈ row count) degrades gracefully into a parallel
    sort instead of a single-reducer WindowExec. Quantizing the score
    upstream is still the cheap path (smaller compacted frame), but
    it is no longer load-bearing for scale.
    """
    by_score = (
        df.select(score.alias("__s"), label.cast("long").alias("__y"))
        .groupBy("__s")
        .agg(
            F.sum("__y").alias("__pos"),
            (F.count("*") - F.sum("__y")).alias("__neg"),
        )
    )
    contrib = global_cumsum(
        by_score,
        [F.col("__s")],
        ["__neg"],
        include_current=False,
        suffix="_below",
    ).select(
        "__pos",
        "__neg",
        (
            F.col("__pos") * (2 * F.col("__neg_below") + F.col("__neg"))
        ).alias("__half_pairs2"),
    )
    return contrib.agg(
        F.round(
            F.sum("__half_pairs2")
            / (2.0 * F.sum("__pos") * F.sum("__neg")),
            round_digits,
        ).alias("auc"),
        F.sum("__pos").alias("n_pos"),
        F.sum("__neg").alias("n_neg"),
    )


def ks_statistic(
    df: DataFrame,
    group: Column,
    value: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance as a 1-row frame
    ``(ks, n_a, n_b)`` where ``group`` is a boolean column naming
    sample A (true) vs sample B (false).

    KS = max over thresholds t of |F_A(t) − F_B(t)|. Computed over
    distinct values: per-value counts for both samples, one ordered
    cumulative pass, and the max of the integer cross-product
    ``|cum_a·n_b − cum_b·n_a|`` — division by ``n_a·n_b`` happens
    once at the end, so the statistic is exact up to the final
    rounding. The cumulative pass is
    :func:`~dataflowex_spark.operators.windows.global_cumsum` (range-
    partitioned, no single-reducer WindowExec) and the totals ride a
    broadcast 1-row aggregate, so a continuous value column scales as
    a parallel sort, same as :func:`roc_auc`.
    """
    by_val = (
        df.select(value.alias("__v"), group.cast("long").alias("__a"))
        .groupBy("__v")
        .agg(
            F.sum("__a").alias("__ca"),
            (F.count("*") - F.sum("__a")).alias("__cb"),
        )
    )
    totals = by_val.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    cum = (
        global_cumsum(by_val, [F.col("__v")], ["__ca", "__cb"])
        .crossJoin(F.broadcast(totals))
        .select(
            "__ca",
            "__cb",
            F.col("__ca_cum").alias("__cuma"),
            F.col("__cb_cum").alias("__cumb"),
            "__na",
            "__nb",
        )
    )
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("__cuma") * F.col("__nb")
                    - F.col("__cumb") * F.col("__na")
                )
            )
            / F.max(F.col("__na") * F.col("__nb")).cast("double"),
            round_digits,
        ).alias("ks"),
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
    )


def mutual_information(
    df: DataFrame,
    x: Column,
    y: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Mutual information I(X;Y) plus marginal entropies H(X), H(Y)
    (all in nats) as a 1-row frame ``(mi, h_x, h_y, n)`` for two
    categorical columns.

    One shuffle on (x, y) builds the joint histogram; the marginals
    are re-aggregations of that (already tiny) frame, joined back by
    broadcast. MI = Σ (c_xy/N)·ln(c_xy·N / (c_x·c_y)) — every term
    is a ratio of integer counts, logged once.
    """
    joint = (
        df.select(x.alias("__x"), y.alias("__y"))
        .groupBy("__x", "__y")
        .agg(F.count("*").alias("__cxy"))
        .localCheckpoint(eager=False)
    )
    mx = joint.groupBy("__x").agg(F.sum("__cxy").alias("__cx"))
    my = joint.groupBy("__y").agg(F.sum("__cxy").alias("__cy"))
    n = joint.agg(F.sum("__cxy").alias("__n"))
    terms = (
        joint.join(F.broadcast(mx), "__x")
        .join(F.broadcast(my), "__y")
        .crossJoin(F.broadcast(n))
        .select(
            "__n",
            "__cx",
            "__cy",
            "__cxy",
            (
                (F.col("__cxy") / F.col("__n"))
                * F.log(
                    F.col("__cxy")
                    * F.col("__n")
                    / (F.col("__cx") * F.col("__cy")).cast("double")
                )
            ).alias("__mi_term"),
        )
    )
    # H(X) and H(Y) from the same joined frame: each (x,y) cell holds
    # c_xy/c_x of its x-marginal, so Σ over cells of
    # (c_xy/N)·ln(N/c_x) telescopes to H(X) exactly.
    return terms.agg(
        F.round(F.sum("__mi_term"), round_digits).alias("mi"),
        F.round(
            F.sum(
                (F.col("__cxy") / F.col("__n"))
                * F.log(F.col("__n") / F.col("__cx").cast("double"))
            ),
            round_digits,
        ).alias("h_x"),
        F.round(
            F.sum(
                (F.col("__cxy") / F.col("__n"))
                * F.log(F.col("__n") / F.col("__cy").cast("double"))
            ),
            round_digits,
        ).alias("h_y"),
        F.max("__n").alias("n"),
    )


def calibration_table(
    df: DataFrame,
    score: Column,
    label: Column,
    tie_break: Column,
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Reliability table: rank rows by score (ties broken by the
    caller's total-order column), cut into ``n_bins`` equal NTILE
    buckets, and compare mean predicted score vs observed positive
    rate per bucket — the classic calibration-curve input.

    Uses :func:`global_ntile` (range-repartitioned parallel rank, no
    single-reducer WindowExec) so the ranking step scales; the output
    is ``n_bins`` rows: ``(bin, n, avg_score, pos_rate)``.
    """
    binned = global_ntile(
        df.select(
            score.alias("__s"),
            label.cast("long").alias("__y"),
            tie_break.alias("__t"),
        ),
        n_bins,
        [F.col("__s"), F.col("__t")],
        out_col="bin",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("__s"), round_digits).alias("avg_score"),
            F.round(F.avg("__y"), round_digits).alias("pos_rate"),
        )
        .orderBy("bin")
    )


def population_stability_index(
    df_ref: DataFrame,
    df_cur: DataFrame,
    value: Column,
    n_bins: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution — the production drift monitor ("has the serving
    population moved off the training population?").

    Bin edges are the reference distribution's discrete decile cuts
    (the rank-crossing rule ``rn·n_bins ≥ n·k`` — the repo's pinned
    percentile definition, so any engine reproduces the same edges).
    Both samples are bucketed by counting edges below the value
    (edges travel broadcast; the bucketing is a scan-local
    expression), and PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur) with
    add-one smoothing on the counts so empty buckets stay finite —
    the smoothing is part of the pinned definition.

    Returns one row ``(psi, n_ref, n_cur)``.

    Raises ``ValueError`` on ``n_bins < 2`` or an empty reference:
    with no reference rows there are no edges, the bucketing
    cross-join would silently drop every current row, and the result
    would be a misleading NULL psi instead of a diagnosable error.
    (The one count() this costs is on the REFERENCE — the small,
    typically cached training-population side — not the current
    serving stream.)
    """
    if n_bins < 2:
        raise ValueError(
            f"population_stability_index: n_bins must be >= 2, got {n_bins}"
        )
    ref = df_ref.select(value.alias("__v"))
    cur = df_cur.select(value.alias("__v"))
    if ref.limit(1).count() == 0:
        raise ValueError(
            "population_stability_index: reference distribution is empty "
            "— no bin edges can be derived; check the reference filter"
        )
    # decile edges via the same scale shape as roc_auc/ks: compacted
    # distinct-value frame, range-partitioned running count (no
    # unpartitioned WindowExec), totals broadcast
    compact_ref = ref.groupBy("__v").agg(F.count("*").alias("__c"))
    ranked = (
        global_cumsum(compact_ref, [F.col("__v")], ["__c"])
        .crossJoin(
            F.broadcast(compact_ref.agg(F.sum("__c").alias("__n")))
        )
        .select("__v", F.col("__c_cum").alias("__rn"), "__n")
    )
    # k-th decile edge = smallest v with rn*n_bins >= n*k (k = 1..n_bins-1)
    edges = (
        ranked.crossJoin(
            F.broadcast(
                ref.sparkSession.range(1, n_bins).select(
                    F.col("id").alias("__k")
                )
            )
        )
        .filter(F.col("__rn") * n_bins >= F.col("__n") * F.col("__k"))
        .groupBy("__k")
        .agg(F.min("__v").alias("__edge"))
        .select("__edge")
    )

    def bucketed(side: DataFrame, tag: str) -> DataFrame:
        # compact to distinct values FIRST, then the broadcast
        # edge-count join runs on #distinct rows, not #input rows
        compact = side.groupBy("__v").agg(F.count("*").alias("__c"))
        return (
            compact.crossJoin(F.broadcast(edges))
            .groupBy("__v", "__c")
            .agg(
                F.sum((F.col("__edge") < F.col("__v")).cast("long")).alias(
                    "__bin"
                )
            )
            .groupBy("__bin")
            .agg(F.sum("__c").alias(f"__c_{tag}"))
        )

    rb = bucketed(ref, "ref")
    cb = bucketed(cur, "cur")
    joined = (
        rb.join(cb, "__bin", "full_outer")
        .select(
            F.coalesce("__c_ref", F.lit(0)).alias("__cr"),
            F.coalesce("__c_cur", F.lit(0)).alias("__cc"),
        )
        .crossJoin(
            F.broadcast(ref.agg(F.count("*").alias("__nr")))
        )
        .crossJoin(
            F.broadcast(cur.agg(F.count("*").alias("__nc")))
        )
    )
    pr = (F.col("__cr") + 1) / (F.col("__nr") + n_bins).cast("double")
    pc = (F.col("__cc") + 1) / (F.col("__nc") + n_bins).cast("double")
    return joined.agg(
        F.round(F.sum((pr - pc) * F.log(pr / pc)), round_digits).alias("psi"),
        F.max("__nr").alias("n_ref"),
        F.max("__nc").alias("n_cur"),
    )


def isotonic_calibration(
    df: DataFrame,
    score: Column,
    label: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Isotonic (PAV) calibration map: the monotone step function
    p(score) that minimizes squared error against the labels — the
    non-parametric way to turn a ranking score into a probability.

    Two-stage by design: (1) ONE distributed aggregation compacts to
    ``(distinct score, n, n_pos)`` — the only pass over the data;
    (2) pool-adjacent-violators runs driver-side over the compacted
    frame (bounded by the caller's score quantization, the same
    contract as :func:`roc_auc` — thousands of buckets, not rows).
    PAV itself is inherently sequential-in-score, so a driver loop
    over buckets is the honest shape; the result ships back as a
    small mapping frame ``(score, n, p_iso)`` suitable for a
    broadcast join against serving data.

    All pooling arithmetic is exact integer (pos, n) ratios compared
    by cross-multiplication, so the fitted steps are engine- and
    float-order-independent.
    """
    compact = (
        df.select(score.alias("s"), label.cast("long").alias("__y"))
        .groupBy("s")
        .agg(F.count("*").alias("n"), F.sum("__y").alias("__pos"))
        .orderBy("s")
    )
    rows = compact.collect()
    # PAV: maintain a stack of blocks (pos, n); merge while the mean
    # would decrease. Comparison pos_a*n_b >= pos_b*n_a is exact.
    blocks: list[list] = []  # [pos, n, count_of_buckets]
    for r in rows:
        blocks.append([r["__pos"], r["n"], 1])
        while (
            len(blocks) > 1
            and blocks[-2][0] * blocks[-1][1]
            >= blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2, c2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2] += c2
    out = []
    i = 0
    for pos, n, c in blocks:
        p_iso = round(pos / n, round_digits)
        for _ in range(c):
            r = rows[i]
            out.append((r["s"], r["n"], p_iso))
            i += 1
    spark = df.sparkSession
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    s_type = compact.schema["s"].dataType
    schema = StructType(
        [
            StructField("s", s_type),
            StructField("n", LongType()),
            StructField("p_iso", DoubleType()),
        ]
    )
    return spark.createDataFrame(out, schema)


def grouped_roc_auc(
    df: DataFrame,
    group: Column,
    label: Column,
    score: Column,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group tie-aware ROC AUC — :func:`roc_auc` partitioned by a
    group column (week, segment, model version), the "is the score
    still discriminating" stability trend. One hash aggregation to
    (group, distinct score), group-partitioned ordered prefix (the
    window key makes this fully parallel across groups), one rollup.
    Returns (group, auc, n_pos, n_neg) with ``group`` named ``grp``.
    """
    by_score = (
        df.select(
            group.alias("grp"),
            score.alias("__s"),
            label.cast("long").alias("__y"),
        )
        .groupBy("grp", "__s")
        .agg(
            F.sum("__y").alias("__pos"),
            (F.count("*") - F.sum("__y")).alias("__neg"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = by_score.select(
        "grp",
        "__pos",
        "__neg",
        (
            F.col("__pos")
            * (
                2 * F.coalesce(F.sum("__neg").over(w), F.lit(0))
                + F.col("__neg")
            )
        ).alias("__half_pairs2"),
    )
    return (
        contrib.groupBy("grp")
        .agg(
            F.round(
                F.sum("__half_pairs2")
                / (2.0 * F.sum("__pos") * F.sum("__neg")),
                round_digits,
            ).alias("auc"),
            F.sum("__pos").alias("n_pos"),
            F.sum("__neg").alias("n_neg"),
        )
        .orderBy("grp")
    )


def brier_decomposition(
    df: DataFrame,
    label: Column,
    score: Column,
    bins: int = 10,
    tiebreak: Column | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Murphy decomposition of the Brier score as a 1-row frame
    ``(brier, reliability, resolution, uncertainty, n)``.

    Brier = mean (p−y)²; binned into ``bins`` equal-count score
    buckets it splits into REL − RES + UNC (exactly when scores are
    constant within a bin, approximately otherwise — all four terms
    are reported directly, no identity is assumed):

    - reliability  = Σ n_k (p̄_k − ō_k)² / N  (calibration gap)
    - resolution   = Σ n_k (ō_k − ō)² / N    (how much the bins
      separate the base rate — higher is better)
    - uncertainty  = ō (1 − ō)               (irreducible term)

    Scale shape: the equal-count binning is
    :func:`~dataflowex_spark.operators.windows.global_ntile` (range-
    partitioned parallel rank, no single-reducer WindowExec), the
    per-bin frame is ``bins`` rows, and the base rate rides a
    broadcast 1-row aggregate. Label sums are integers; only the
    score means carry float summation order, absorbed by the final
    rounding — the same hash-stability discipline as :func:`roc_auc`.
    """
    tb = tiebreak if tiebreak is not None else F.lit(0)
    s = df.select(
        score.cast("double").alias("__p"),
        label.cast("long").alias("__y"),
        tb.alias("__tb"),
    )
    binned = global_ntile(
        s, bins, [F.col("__p"), F.col("__tb")], out_col="__bin"
    )
    b = binned.groupBy("__bin").agg(
        F.count("*").alias("__nb"),
        F.sum("__y").alias("__sy"),
        F.avg("__p").alias("__avg_p"),
        F.avg(
            (F.col("__p") - F.col("__y")) * (F.col("__p") - F.col("__y"))
        ).alias("__bs"),
    )
    tot = b.agg(
        F.sum("__nb").alias("__n"), F.sum("__sy").alias("__pos")
    )
    per_bin = b.crossJoin(F.broadcast(tot)).select(
        "__nb",
        "__bs",
        (F.col("__sy") / F.col("__nb")).alias("__o_k"),
        "__avg_p",
        "__n",
        (F.col("__pos") / F.col("__n")).alias("__o"),
    )
    return per_bin.agg(
        F.round(
            F.sum(F.col("__nb") * F.col("__bs")) / F.max("__n"),
            round_digits,
        ).alias("brier"),
        F.round(
            F.sum(
                F.col("__nb")
                * (F.col("__avg_p") - F.col("__o_k"))
                * (F.col("__avg_p") - F.col("__o_k"))
            )
            / F.max("__n"),
            round_digits,
        ).alias("reliability"),
        F.round(
            F.sum(
                F.col("__nb")
                * (F.col("__o_k") - F.col("__o"))
                * (F.col("__o_k") - F.col("__o"))
            )
            / F.max("__n"),
            round_digits,
        ).alias("resolution"),
        F.round(
            F.max(F.col("__o") * (1.0 - F.col("__o"))), round_digits
        ).alias("uncertainty"),
        F.max("__n").cast("long").alias("n"),
    )


def bh_reject(
    stats: DataFrame,
    stat_col: str,
    key_col: str,
    thresholds_ppm: list[int],
) -> DataFrame:
    """Benjamini–Hochberg FDR control over a FAMILY of test
    statistics (the multiple-comparison step every experimentation
    platform needs once it reads out more than one metric/segment —
    completes the A/B family: q272 two-proportion readout, q273
    CUPED, this corrects the family-wide false-discovery rate).

    Works on a chi-square(1df)-style statistic quantized to ppm
    (BIGINT) rather than on p-values directly: p(k) ≤ α·k/m  ⟺
    stat(k) ≥ T_k where ``thresholds_ppm[k-1]`` is the pinned ppm
    critical value for rank k (the inverse-CDF ladder idiom of q283 —
    literals baked into BOTH engines, so the decision is pure integer
    comparison, no libm tail functions at query time). BH: sort
    statistics descending (best-evidence first), find the largest
    rank k with stat ≥ T_k, reject ranks 1..k.

    The ranking window is over the TEST FAMILY (m = segments or
    metrics, e.g. 25 nations) — bounded grain, never row-scale, the
    same calendar-sized-reducer contract as q173/q237. Returns
    (key, stat, rnk, rejected)."""
    m = len(thresholds_ppm)
    w = Window.orderBy(F.col(stat_col).desc(), F.col(key_col))
    ranked = stats.withColumn("rnk", F.row_number().over(w))
    thr = None
    for k, t in enumerate(thresholds_ppm, start=1):
        thr = (
            F.when(F.col("rnk") == k, F.lit(t))
            if thr is None
            else thr.when(F.col("rnk") == k, F.lit(t))
        )
    thr = thr.otherwise(F.lit(thresholds_ppm[-1]))
    ranked = ranked.withColumn(
        "kpass",
        F.when(F.col(stat_col) >= thr, F.col("rnk")).otherwise(F.lit(0)),
    )
    kmax = F.max("kpass").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        ranked.withColumn("rejected", F.col("rnk") <= kmax)
        .drop("kpass")
        .filter(F.col("rnk") <= F.lit(m))
    )


# Pinned chi-square(1df) critical values, ppm, for the BH ladder at
# alpha = 0.05 over m = 25 tests: T_k = (Phi^-1(1 - 0.05*(k/25)/2))^2,
# computed once with the Acklam rational approximation + one Halley
# refinement (|err| < 1e-9, far below the ppm quantum) and baked as
# integer literals so BOTH engines decide p(k) <= alpha*k/m by pure
# integer comparison (the q283 inverse-CDF-ladder idiom). Sanity
# anchors: k=25 -> 1.96^2 = 3.841459, k=1 -> 3.0902^2 = 9.549536.
BH_CHI2_PPM_M25 = [
    9549536, 8283815, 7550303, 7033474, 6634897, 6310869, 6038143,
    5802874, 5596149, 5411894, 5245785, 5094632, 4956019, 4828067,
    4709292, 4598497, 4494704, 4397105, 4305022, 4217885, 4135204,
    4056562, 3981594, 3909986, 3841459,
]


def wasserstein_drift(
    df,
    group_cols: list[str],
    bin_col: str,
    cohort_col: str,
    bin_width: int,
):
    """1-D Wasserstein distance (earth-mover's) between two cohorts'
    distributions of an integer-binned value, per group — the drift
    number with UNITS (how far mass moved, in the value's own scale),
    where KS (ks_two_sample) gives a max-gap probability and PSI a
    log-ratio score. For equal-width bins W1 has the closed form
    width·Σ_b |F_a(b) − F_b(b)|, computed here ENTIRELY in integers
    via cross-multiplied CDFs (|cum_a·n_b − cum_b·n_a|, the q388
    t-closeness machinery pointed at two cohorts instead of
    group-vs-global): one per-(group,bin,cohort) count aggregate, a
    broadcast full bin grid so CDFs align on missing bins, windows
    PARTITIONED BY group, one final integer floor-divide. Magnitude
    contract: width·1000·Σ|…| must fit BIGINT (Σ ≤ m·n_a·n_b) —
    quantize upstream. ``cohort_col`` must be 0/1.
    Returns (group_cols…, n_a, n_b, w1_milli) where w1_milli is
    1000·W1 in bin-value units."""
    from pyspark.sql import Window, functions as F

    g = [F.col(c) for c in group_cols]
    cnt = df.groupBy(*g, F.col(bin_col).alias("__b")).agg(
        F.sum(
            F.when(F.col(cohort_col) == 0, 1).otherwise(0)
        ).cast("long").alias("__ca"),
        F.sum(
            F.when(F.col(cohort_col) == 1, 1).otherwise(0)
        ).cast("long").alias("__cb"),
    )
    bins = df.select(F.col(bin_col).alias("__b")).distinct()
    groups = df.groupBy(*g).agg(
        F.sum(F.when(F.col(cohort_col) == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col(cohort_col) == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    grid = groups.crossJoin(F.broadcast(bins))
    full = grid.join(cnt, [*group_cols, "__b"], "left").select(
        *group_cols,
        "n_a",
        "n_b",
        "__b",
        F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
    )
    w = Window.partitionBy(*group_cols).orderBy("__b")
    return (
        full.select(
            *group_cols,
            "n_a",
            "n_b",
            F.sum("__ca").over(w).alias("__cum_a"),
            F.sum("__cb").over(w).alias("__cum_b"),
        )
        .groupBy(*group_cols, "n_a", "n_b")
        .agg(
            F.sum(
                F.abs(
                    F.col("__cum_a") * F.col("n_b")
                    - F.col("__cum_b") * F.col("n_a")
                )
            ).alias("__num")
        )
        .select(
            *group_cols,
            "n_a",
            "n_b",
            F.expr(
                f"CAST(div({bin_width} * 1000 * __num, n_a * n_b) "
                "AS BIGINT)"
            ).alias("w1_milli"),
        )
    )
