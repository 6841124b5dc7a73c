"""Mergeable frequency sketches.

Count-min (Cormode & Muthukrishnan, J.Alg 2005): a depth×width grid
of counters; each item increments one counter per row (row-seeded
hash), a point query reads the MIN across rows — always an
OVER-estimate, with error ≤ εN at depth ln(1/δ), width e/ε. The
sketch is a few KB regardless of stream size and merges by cell-wise
addition, which is exactly what a 1000-executor aggregation wants:
one partial-agg pass builds it, no per-key state survives the scan.

Hashing uses the repo's portable md5 bucket (identical in Spark,
DuckDB, and Python), so sketch contents — not just semantics — are
reproducible by any engine, which is what lets the driver's DuckDB
oracle verify cells and estimates exactly.

The companion exact/estimate audit is the standard way to validate a
sketch deployment: join estimates against exact counts on a small
fixture and check bias ≥ 0 with bounded overshoot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataflowex_spark.operators.sampling import portable_bucket


def _row_key(key_col: str, row: int):
    return F.concat(
        F.col(key_col).cast("string"), F.lit("#"), F.lit(str(row))
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the depth×width cell table from a key stream: one
    hash-aggregate over (row, bucket) — map-side partial combine does
    the heavy lifting, and the result is depth·width rows total.
    Returns (row, bucket, c)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    entry = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    portable_bucket(_row_key(key_col, i), width).alias(
                        "bucket"
                    ),
                )
                for i in range(depth)
            ]
        )
    ).alias("e")
    return (
        df.select(F.col(key_col), w.alias("__w"))
        .select(entry, "__w")
        .select(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"), "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").cast("long").alias("c"))
    )


def count_min_lookup(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query estimates for a key frame: re-derive each key's
    (row, bucket) coordinates, join the (tiny, broadcast) cell table,
    take the MIN across rows. Keys absent from the stream still get
    the collision mass of their cells — the documented over-estimate.
    Returns (key_col, out_col)."""
    probes = keys.select(key_col).distinct()
    coords = None
    for i in range(depth):
        part = probes.select(
            key_col,
            F.lit(i).alias("row"),
            portable_bucket(_row_key(key_col, i), width).alias("bucket"),
        )
        coords = part if coords is None else coords.unionAll(part)
    return (
        coords.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias(out_col)
        )
    )


# --- HyperLogLog (Flajolet et al. 2007), portable-register variant ---
#
# Spark ships approx_count_distinct / hll_sketch_agg, but their
# register contents are engine-private (xxhash / DataSketches), so
# the driver's DuckDB oracle can only rows-check them (q35, q156).
# This variant makes the SKETCH itself cross-engine reproducible:
# the item hash is the repo's portable 60-bit md5 bucket, the
# register index is its low 6 bits, and the rank (leading-zero
# count) is derived from the BIT LENGTH of the remaining 54-bit
# word via bin() — an integer-exact expression Spark and DuckDB
# evaluate identically (both render binary without leading zeros).
# The register table is therefore value-hash-oracleable, and the
# harmonic-mean denominator is folded into ONE exact integer
# Σ 2^(55-M_j) so the final float estimate is a single IEEE
# division — deterministic in any engine and any reduction order.
#
# At 100 TB the shape is the whole point: per group the state is 64
# registers built by one map-side-combining MAX aggregate — no
# distinct-value shuffle, mergeable across executors/days by
# register-wise MAX.

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
_HLL_WBITS = 60 - HLL_P  # bits left after the register index
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 64.0)  # alpha_64, same literal in SQL
_HLL_POW2_W1 = float(1 << (_HLL_WBITS + 1))  # 2^55, exact double literal


def _hll_hash(key_col: str):
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = HLL_P
) -> DataFrame:
    """Per-group register table (group_cols..., j, m_j): one hash
    aggregate over (group, register) — at most 2^p rows per group
    survive the map-side combine. rho(w) = wbits - bitlength(w) + 1
    (wbits = 60 - p), with the all-zero word pinned to wbits + 1."""
    m = 1 << p
    wbits = 60 - p
    h = _hll_hash(key_col)
    j = F.pmod(h, F.lit(m))
    w = F.floor(h / F.lit(m)).cast("long")
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(w)) + 1
    )
    cols = list(group_cols) if group_cols else []
    return (
        df.select(*cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*cols, "j")
        .agg(F.max("rho").cast("long").alias("m_j"))
    )


def hll_alpha(m: int) -> float:
    """The standard bias constant: same closed form Flajolet gives
    for m ≥ 128; the small-m literals for 16/32/64."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return _HLL_ALPHA
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    out_col: str = "hll_est",
    p: int = HLL_P,
) -> DataFrame:
    """Raw HLL estimate per group from the register table: absent
    registers count as M=0, the denominator is the exact integer
    Σ 2^(55-M_j) (≤ 64·2^55 < 2^62, bigint-safe), and the only float
    step is alpha·m²·2^55 / S — deliberately NOT applying the
    libm-dependent linear-counting correction (ln) so the estimate
    is bit-identical in every engine; raw-HLL error suffices for the
    audit use-case and the bias is visible in the companion exact
    column."""
    m = 1 << p
    wbits = 60 - p
    spark = registers.sparkSession
    groups = registers.select(*group_cols).distinct()
    grid = groups.crossJoin(
        spark.range(m).select(F.col("id").alias("j"))
    )
    s = (
        grid.join(registers, [*group_cols, "j"], "left")
        .select(
            *group_cols,
            F.expr(
                f"shiftleft(cast(1 as bigint), "
                f"cast({wbits + 1} - coalesce(m_j, 0) as int))"
            ).alias("__term"),
        )
        .groupBy(*group_cols)
        .agg(F.sum("__term").cast("long").alias("__s"))
    )
    est = F.floor(
        F.lit(hll_alpha(m))
        * F.lit(float(m * m))
        * F.lit(float(1 << (wbits + 1)))
        / F.col("__s").cast("double")
    ).cast("long")
    return s.select(*group_cols, est.alias(out_col))


# --- AMS tug-of-war sketch (Alon–Matias–Szegedy, STOC'96) ---
#
# F2 = Σ_k f_k² is the SELF-JOIN SIZE — the quantity a planner wants
# before committing to a join strategy on a possibly-skewed key.
# Each estimator keeps one counter Z_i = Σ_rows sign_i(key); Z_i² is
# an unbiased F2 estimate, averaged over s estimators. Signs come
# from the portable md5 hash's parity, so every counter — and hence
# the estimate — is EXACT INTEGER arithmetic reproducible by the
# DuckDB oracle (no float anywhere). One map-side-combining SUM per
# estimator; sketch size s counters regardless of stream size,
# mergeable by addition.


def ams_f2_estimators(
    df: DataFrame, key_col: str, s: int = 16
) -> DataFrame:
    """Per-estimator tug-of-war counters: returns (i, z) with
    z = Σ sign_i(key) over the stream — s rows total out of one
    hash aggregate."""
    entry = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    (portable_bucket(_row_key(key_col, i), 2) * 2 - 1)
                    .cast("long")
                    .alias("sign"),
                )
                for i in range(s)
            ]
        )
    ).alias("e")
    return (
        df.select(F.col(key_col))
        .select(entry)
        .select(F.col("e.i").alias("i"), F.col("e.sign").alias("sign"))
        .groupBy("i")
        .agg(F.sum("sign").cast("long").alias("z"))
    )


def ams_f2_estimate(estimators: DataFrame, s: int = 16) -> DataFrame:
    """Mean of squared counters — integer division keeps the estimate
    engine-exact. Returns a single row (ams_est)."""
    return estimators.agg(
        F.floor(F.sum(F.col("z") * F.col("z")) / F.lit(s))
        .cast("long")
        .alias("ams_est")
    )


# -- t-digest -----------------------------------------------------------


def _k1(q: float, delta: int) -> float:
    """t-digest k1 scale function (Dunning & Ertl): compresses the
    middle of the distribution, keeps the tails at near-unit centroid
    weight — the property that makes p99/p999 reads accurate."""
    import math

    q = min(1.0, max(0.0, q))
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def tdigest_compress(means, weights, total: float, delta: int = 200):
    """One deterministic compression pass over centroids SORTED BY
    MEAN: greedily merge a run of adjacent centroids while the k1
    span of the merged run stays ≤ 1 (`k(q_hi) − k(q_lo) ≤ 1`), which
    enforces the t-digest weight invariant by construction — max
    centroid weight at quantile q is O(total · q(1−q)/delta). Given
    the same sorted input the output is bit-identical (no RNG, no
    order dependence) — the determinism the repo's oracle discipline
    requires. Returns (means, weights) numpy arrays."""
    import numpy as np

    out_m, out_w = [], []
    acc = 0.0  # weight consumed before the current run
    run_w = 0.0
    run_sum = 0.0
    k_lo = _k1(0.0, delta)
    for m, w in zip(means, weights):
        if run_w > 0.0 and _k1((acc + run_w + w) / total, delta) - k_lo > 1.0:
            out_m.append(run_sum / run_w)
            out_w.append(run_w)
            acc += run_w
            run_w, run_sum = 0.0, 0.0
            k_lo = _k1(acc / total, delta)
        run_w += w
        run_sum += m * w
    if run_w > 0.0:
        out_m.append(run_sum / run_w)
        out_w.append(run_w)
    return np.asarray(out_m), np.asarray(out_w)


def _compress_sorted_unit(v, delta: int):
    """Unit-weight fast path of :func:`tdigest_compress` over an
    already-sorted value array — the FIRST-level (per-partition) pass,
    where every input weight is 1. With w_i = 1 the greedy closing
    rule "close when k1((acc+run_w+1)/n) − k1(acc/n) > 1" depends only
    on INDICES, never on the values, so run boundaries come from
    bisection on the monotone k1 scale (O(centroids·log n) asin calls,
    evaluated with the same ``_k1`` at the same arguments as the
    reference loop → identical cuts) and run means from segmented
    numpy sums — replacing an O(n) interpreted-Python loop with one
    asin call per VALUE (guide §4.2). Means can differ from the
    sequential reference in the last ulp (summation order); every
    consumer reads quantiles whose rank-error budget is ~8·n·q(1−q)/δ,
    so ulp-level mean shifts are immaterial by construction.
    Returns (means, weights) numpy arrays."""
    import numpy as np

    n = len(v)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    total = float(n)
    starts = []  # run start indices
    a = 0
    while a < n:
        starts.append(a)
        k_lo = _k1(a / total, delta)
        # largest b in [a+1, n] with k1(b/total) - k_lo <= 1
        lo, hi = a + 1, n
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if _k1(mid / total, delta) - k_lo <= 1.0:
                lo = mid
            else:
                hi = mid - 1
        a = lo
    starts_arr = np.asarray(starts, dtype=np.int64)
    sums = np.add.reduceat(v, starts_arr)
    counts = np.diff(np.append(starts_arr, n)).astype(float)
    return sums / counts, counts


def tdigest_build(df: DataFrame, value_col: str, delta: int = 200,
                  n_parts: int = 32):
    """Distributed deterministic t-digest: values bucket by an
    EXPLICIT value-range rule (floor over the min/max span — not
    ``repartitionByRange``, whose sampled split points vary run to
    run and would break bit-determinism), each partition compresses
    its sorted values to ≤O(delta) centroids per bucket in one pandas
    pass over the WHOLE partition (Arrow batch boundaries must not
    influence centroid formation), then one merge-compress over the
    mean-sorted collected centroids. The collect is bounded at
    n_parts × O(delta) rows (a few KB — the whole point of a sketch);
    at 1000 executors the same two-level shape holds, only n_parts
    grows. Returns (means, weights, total_n)."""
    import pandas as pd

    src = df.select(F.col(value_col).cast("double").alias("v")).where(
        F.col("v").isNotNull()
    )
    stats = src.agg(
        F.count("*").alias("n"), F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).first()
    total, mn, mx = stats["n"], stats["mn"], stats["mx"]
    if total == 0:
        import numpy as np

        return np.zeros(0), np.zeros(0), 0
    span = (mx - mn) or 1.0

    def part_digest(it):
        import numpy as np

        chunks = [pdf["v"].to_numpy(float) for pdf in it]
        if not chunks:
            return
        v = np.sort(np.concatenate(chunks))
        m, w = _compress_sorted_unit(v, delta)
        yield pd.DataFrame({"mean": m, "weight": w})

    bucket = F.least(
        F.lit(n_parts - 1),
        F.floor((F.col("v") - F.lit(mn)) / F.lit(span) * n_parts),
    ).cast("int")
    # repartition on the bucket EXPRESSION: the exchange then carries
    # only v (8 B/row); a materialized __b column would ride along
    # just to be dropped (guide §2.3 "project before the exchange").
    cent = (
        src.repartition(n_parts, bucket)
        .mapInPandas(part_digest, "mean double, weight double")
        .collect()
    )
    rows = sorted((r["mean"], r["weight"]) for r in cent)
    import numpy as np

    means = np.asarray([m for m, _ in rows])
    weights = np.asarray([w for _, w in rows])
    m, w = tdigest_compress(means, weights, float(total), delta)
    return m, w, total


def tdigest_quantile(means, weights, total: float, q: float) -> float:
    """Standard t-digest quantile read: walk centroid midpoints and
    linearly interpolate between neighbors around rank q·total."""
    if len(means) == 0:
        raise ValueError(
            "tdigest_quantile: empty digest (no non-null values)"
        )
    target = q * total
    cum = 0.0
    prev_mid, prev_mean = 0.0, means[0]
    for m, w in zip(means, weights):
        mid = cum + w / 2.0
        if target < mid:
            if mid == prev_mid:
                return float(m)
            frac = (target - prev_mid) / (mid - prev_mid)
            return float(prev_mean + frac * (m - prev_mean))
        prev_mid, prev_mean = mid, m
        cum += w
    return float(means[-1])
