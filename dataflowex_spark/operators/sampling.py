"""Sampling & splitting for training-data pipelines.

Deterministic by construction: splits key off a hash of a stable id,
never off row order or RNG state, so reruns and backfills land every
row in the same split — the property that matters when the corpus is
100 TB and the split must be reproducible across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.2,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic hash split: bucket = xxhash64(id, seed) mod 10k;
    rows below the cut are 'test'. Same id → same split, forever,
    regardless of partitioning, ordering, or cluster size."""
    cut = int(test_fraction * 10_000)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(10_000))
    return df.withColumn(
        split_col, F.when(bucket < cut, "test").otherwise("train")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): keeps each class at
    its own rate — the class-balance tool for training corpora. Scan-
    side filter, no shuffle."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def portable_bucket(col, buckets: int = 10_000):
    """Cross-engine deterministic bucket in [0, buckets): first 15 hex
    digits of md5(value-as-string) → bigint, mod buckets.

    md5 of the UTF-8 string is identical in Spark, DuckDB, and Python,
    so a sample defined this way is reproducible — and auditable — by
    ANY engine, a property xxhash64 (Spark-only) can't give. 15 hex
    digits = 60 bits, safely inside a signed bigint.

    DuckDB spelling of the same bucket:
    ``CAST(('0x' || substr(md5(CAST(x AS VARCHAR)),1,15)) AS BIGINT) % buckets``
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(buckets))


def stratified_sample_hash(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    id_col: str,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its portable
    id-bucket falls below ``fraction × buckets`` for its stratum.

    Same class-balance tool as :func:`stratified_sample`, but hash-
    keyed off the stable id instead of RNG state — reruns, backfills,
    and other engines (the DuckDB oracle) reproduce the exact row set.
    Strata absent from ``fractions`` are dropped (sampleBy semantics).
    Scan-side filter, no shuffle."""
    cut = None
    for stratum, frac in fractions.items():
        c = F.lit(int(round(frac * buckets)))
        cond = F.col(strata_col) == stratum
        cut = F.when(cond, c) if cut is None else cut.when(cond, c)
    cut = cut.otherwise(F.lit(0))
    return df.filter(portable_bucket(F.col(id_col), buckets) < cut)


def rebalance_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    targets: dict[str, float],
    buckets: int = 10_000,
) -> DataFrame:
    """Downsample groups so the surviving corpus matches a target
    mixture (the data-mixing step of pre-training: 'the final corpus
    should be 50% web, 30% code, 20% books').

    Keeps the LARGEST corpus consistent with the targets: capacity
    ``cap = min_g(n_g / p_g)`` (the scarcest group relative to its
    share binds), then each group keeps fraction ``p_g·cap / n_g`` of
    its rows. Selection is by portable md5 bucket of the id, so the
    kept set is deterministic, partition-independent, and reproducible
    by any engine. Groups absent from ``targets`` are dropped.

    Scale shape: one tiny aggregate (distinct groups) broadcast back
    onto the fact side as a scan-side filter — the corpus itself never
    shuffles.
    """
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        f"`{group_col}` string, `_p` double",
    )
    cnt = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    # global min over the groups frame — |distinct groups| rows, fine
    cap = F.min(F.col("_n") / F.col("_p")).over(Window.partitionBy())
    keep = (
        cnt.join(tgt, group_col)
        .withColumn("_cap", cap)
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0), F.col("_p") * F.col("_cap") / F.col("_n")
                )
                * buckets
            )
            .cast("bigint")
            .alias("_cut"),
        )
    )
    return (
        df.join(F.broadcast(keep), group_col)
        .filter(portable_bucket(F.col(id_col), buckets) < F.col("_cut"))
        .drop("_cut")
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    buckets: int = 1_000_000,
    prefilter_safety: float | None = None,
) -> DataFrame:
    """Deterministic fixed-size sample per group: the k rows whose
    portable md5 bucket (tie: id) ranks lowest — a 'reservoir' that is
    identical across engines, partitionings, and reruns.

    Scale path: the plain form sorts each whole group in one window
    task. With ``prefilter_safety=s``, a broadcast of per-group counts
    drives a scan-side filter ``bucket < s·k/n_g · buckets`` BEFORE
    the window, so only ~s·k rows per group reach the sort. The
    prefilter is itself hash-deterministic: whenever ≥ k rows pass
    (overwhelming for s ≥ 4), the result is bit-identical to the
    plain form — asserted by test, not assumed.
    """
    b = portable_bucket(F.col(id_col), buckets)
    src = df.withColumn("__b", b)
    if prefilter_safety:
        cnt = df.groupBy(group_col).agg(F.count("*").alias("__n"))
        cut = (
            F.least(
                F.lit(buckets).cast("bigint"),
                F.ceil(F.lit(float(prefilter_safety * k * buckets)) / F.col("__n")),
            )
        ).cast("bigint")
        src = (
            src.join(
                F.broadcast(cnt.select(group_col, cut.alias("__cut"))),
                group_col,
            )
            .filter(F.col("__b") < F.col("__cut"))
            .drop("__cut")
        )
    w = Window.partitionBy(group_col).orderBy("__b", id_col)
    return (
        src.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__b", "__rk")
    )


def deterministic_downsample(
    df: DataFrame,
    id_col: str,
    keep_one_in: int,
    seed: int = 42,
) -> DataFrame:
    """Keep every id whose hash falls in 1/keep_one_in of the space —
    the reproducible alternative to ``df.sample`` for corpus
    downsampling (a row's fate never depends on which partition or
    run it appeared in)."""
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(keep_one_in)) == 0
    )


def token_budget_trim(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_tok_col: str,
    budget: int,
    prefer_desc: bool = True,
) -> DataFrame:
    """Per-group token-budget selection: keep rows (longest-first by
    default, ``id_col`` tie-break) while the running token total stays
    within ``budget`` — the greedy trim step of a mixture builder.
    Adds ``cum_tokens``.

    The per-group running sum is inherently sequential, so this is one
    keyed window; for sources too hot for a single reducer,
    binary-search a per-group length threshold with two aggregate
    passes instead (same selection, no window)."""
    order = (
        F.col(n_tok_col).desc() if prefer_desc else F.col(n_tok_col).asc()
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "cum_tokens", F.sum(n_tok_col).over(w).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling via PRIORITY SAMPLING
    (Duffield–Lund–Thorup): priority = u/w where u is a uniform
    md5-hash bucket of the id and w the row's weight; the k smallest
    priorities form a without-replacement sample with inclusion
    probability ∝ w. All-arithmetic (two IEEE divisions on exact
    integer inputs, no libm → cross-engine bit-equal), scan-local
    priorities, global top-k via TakeOrdered. Rows with
    non-positive weight are excluded."""
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    priority = (
        (bucket + F.lit(1)).cast("double")
        / F.lit(1152921504606846976).cast("double")
        / F.col(weight_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("priority", priority)
        .orderBy("priority", id_col)
        .limit(k)
    )


def quantile_normalize(
    df,
    value_col: str,
    group_col: str,
    id_col: str,
    out_col: str = "qn_value",
    max_levels: int | None = None,
):
    """Quantile normalization: map each row's value to the GLOBAL
    distribution's value at the same percent rank within its group —
    the batch-effect remover. Rank matching is exact integer
    cross-multiplication ((cum_g−1)·(n_s−1) ≥ (rn_s−1)·(N−1)), so no
    float percent_rank can flip a boundary.

    Scale shape (r6): the global distribution travels as a
    value-COMPACTED frame whose cumulative pass is
    :func:`~dataflowex_spark.operators.windows.global_cumsum`
    (range-partitioned, zero unpartitioned WindowExec) — a continuous
    domain now degrades to a parallel sort, not a single reducer.
    ``max_levels`` remains the cost knob for continuous domains:
    values are first quantized onto an equi-width grid (one min/max
    aggregate, scan-local floor()), capping the compacted frame —
    and the broadcast of it — at ``max_levels`` rows (normalized
    outputs land on grid representatives, the standard rank-binning
    trade).
    """
    from pyspark.sql import Window, functions as F

    v = F.col(value_col)
    if max_levels is not None:
        if max_levels < 2:
            raise ValueError("quantile_normalize: max_levels must be >= 2")
        lohi = df.select(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        )
        df = df.crossJoin(F.broadcast(lohi))
        width = (F.col("__hi") - F.col("__lo")) / F.lit(max_levels)
        level = F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.floor((v - F.col("__lo")) / width),
                F.lit(max_levels - 1),
            )
        )
        # grid representative: bucket midpoint (cast keeps the
        # original column's flavor out of it — doubles by design)
        df = df.withColumn(
            "__qv",
            F.col("__lo") + (level + F.lit(0.5)) * width,
        ).drop("__lo", "__hi")
        v = F.col("__qv")

    sw = Window.partitionBy(group_col)
    src = df.select(
        id_col,
        group_col,
        value_col,
        v.alias("__v"),
        F.row_number().over(sw.orderBy(v, id_col)).alias("__rn"),
        F.count("*").over(sw).alias("__ns"),
    )
    from dataflowex_spark.operators.windows import global_cumsum

    gv = df.groupBy(v.alias("__g")).agg(F.count("*").alias("__c"))
    total = gv.agg(F.sum("__c").alias("__n"))
    gcum = (
        global_cumsum(gv, [F.col("__g")], ["__c"])
        .crossJoin(F.broadcast(total))
        .select("__g", F.col("__c_cum").alias("__cum"), "__n")
    )
    return (
        src.crossJoin(F.broadcast(gcum))
        .groupBy(id_col, group_col, value_col)
        .agg(
            F.min(
                F.when(
                    (F.col("__cum") - 1) * (F.col("__ns") - 1)
                    >= (F.col("__rn") - 1) * (F.col("__n") - 1),
                    F.col("__g"),
                )
            ).alias(out_col)
        )
    )


def approx_sum_ci(
    df: DataFrame,
    group_cols: list,
    value_col,
    id_col: str,
    buckets: int = 10,
    z_ppm: int = 1_959_964,
) -> DataFrame:
    """APPROXIMATE GROUP-BY SUM with CLT error bars from a
    deterministic hash sample (BlinkDB-style online-aggregation
    shape): scan only the rows whose portable id-bucket is 0 (one of
    ``buckets``), estimate each group's total by Horvitz–Thompson
    inverse-probability scaling, and attach a 95% half-width from
    the Poisson-sampling variance estimator
    V̂ = Σ_sample x²·(1−f)/f² — computable from the sample alone.

    At 100 TB this is the point: a 1/10 hash sample answers the
    dashboard query with a calibrated ±bound at a tenth of the scan
    (and the sample predicate reaches the parquet scan, it is one
    deterministic md5 comparison per row — no RNG state, the exact
    sampled row set reproducible by any engine, q92/q155 discipline).

    ``value_col`` must be an INTEGER column expression (cents). The
    estimate is exact integer (sum × buckets); the half-width does
    Σx² in DECIMAL(38,0) (BIGINT would overflow at ~sf1) and takes
    one sqrt + two multiplies in double — identical IEEE steps in
    any engine. Returns group_cols + (n_sampled, est, half)."""
    f_inv = buckets  # inclusion probability f = 1/buckets
    one_minus_f_over_f2 = float(buckets * buckets - buckets)
    sampled = df.filter(portable_bucket(F.col(id_col), buckets) == 0)
    x = value_col if not isinstance(value_col, str) else F.col(value_col)
    x = x.cast("decimal(19,0)")
    return (
        sampled.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            (F.sum(x) * F.lit(f_inv))
            .cast("decimal(38,0)")
            .cast("long")
            .alias("est"),
            F.round(
                F.lit(z_ppm / 1e6)
                * F.sqrt(
                    F.sum((x * x).cast("decimal(38,0)")).cast("double")
                    * F.lit(one_minus_f_over_f2)
                ),
                0,
            )
            .cast("long")
            .alias("half"),
        )
    )
