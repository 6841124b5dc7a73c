"""Time-series regularization: resample an event stream onto a fixed
grid and fill gaps (the feature-engineering step before any
sequence-model training — irregular event times in, dense aligned
series out).

Scale shape: one keyed aggregate collapses events to (key, slot)
observations, the grid is generated per key from its own span (never
a global cross-join of keys × slots), and the fill is a per-key
ordered window. Everything shuffles on the key; the per-key row count
is span/step, so step choice — not data volume — bounds the state.
The single-task-per-key window is the known hazard for a key whose
span/step ratio is huge; pick a coarser unit or split the key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def time_grain_rollup(
    df: DataFrame,
    ts_col: str,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    value_col: str | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate: counts (and an exact
    decimal value sum) at several time granularities in ONE pass —
    explode the row into (grain, bucket) pairs, then a single hash
    aggregate. One scan + one shuffle for all grains, instead of one
    job per rollup table; partial aggregation still applies because
    the explode happens before the shuffle.

    Returns (grain, bucket, n[, total]).
    """
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("grain"),
                    F.date_trunc(g, F.col(ts_col))
                    .cast("timestamp_ntz")
                    .alias("bucket"),
                )
                for g in grains
            ]
        )
    ).alias("g")
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total")
        )
    keep = [value_col] if value_col else []
    return (
        df.select(pairs, *keep)
        .select("g.grain", "g.bucket", *keep)
        .groupBy("grain", "bucket")
        .agg(*aggs)
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
) -> DataFrame:
    """Resample to one row per ``unit`` per key, carrying the last
    observation forward across empty slots (LOCF).

    Slot value = the value of the LAST event in the slot, ties broken
    by value (a deterministic ``max_by`` over the (ts, value) struct —
    one partial+final hash aggregate, no per-slot sort). The grid for
    each key runs from its first to its last observed slot, so there
    are no leading NULLs and ``v_fill`` is total.

    Returns (key, slot, v_fill, observed) — ``observed`` False marks
    gap rows whose value was carried forward.
    """
    slot = F.date_trunc(unit, F.col(ts_col)).cast("timestamp_ntz")
    obs = df.groupBy(F.col(key_col), slot.alias("slot")).agg(
        F.max_by(value_col, F.struct(F.col(ts_col), F.col(value_col))).alias(
            "v_obs"
        )
    )
    spans = obs.groupBy(key_col).agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = spans.select(
        key_col,
        F.explode(F.expr(f"sequence(lo, hi, interval 1 {unit})")).alias("slot"),
    )
    joined = grid.join(obs, [key_col, "slot"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "slot",
        F.last("v_obs", ignorenulls=True).over(w).alias("v_fill"),
        F.col("v_obs").isNotNull().alias("observed"),
    )


def resample_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "day",
    quant: int = 1000,
) -> DataFrame:
    """Resample to one row per ``unit`` per key with LINEAR
    interpolation across gaps (the companion of :func:`resample_locf`
    for signals where a straight line beats a step).

    Values are floor-quantized to BIGINT (``quant`` units) and the
    interpolation is pure integer arithmetic:

        v(slot) = prev + (next − prev) · Δ  //  span

    (// = FLOOR division — toward −∞, pinned explicitly because SQL
    engines disagree on integer `/` for negative slopes (DuckDB's //
    truncates toward zero); Δ = slots since prev observation, span =
    slots between the bracketing observations. Floor-of-division is
    deliberate — a float mul-add here differs by one ulp across
    engines (FMA contraction), while the bounded magnitudes make
    floor(double-division) exact everywhere. Trailing slots past the last observation carry
    it forward (no extrapolation).

    Same scale shape as LOCF: per-key grid from the key's own span,
    one keyed aggregate + two keyed window passes. ``unit`` is pinned
    to 'day' (Δ/span are measured with datediff in days; a coarser
    unit would need its own slot index).
    """
    if unit != "day":
        raise ValueError("resample_linear supports unit='day' only")
    slot = F.date_trunc(unit, F.col(ts_col)).cast("timestamp_ntz")
    obs = df.groupBy(F.col(key_col), slot.alias("slot")).agg(
        F.max_by(
            F.floor(F.col(value_col) * quant).cast("long"),
            F.struct(F.col(ts_col), F.col(value_col)),
        ).alias("v_obs")
    )
    spans = obs.groupBy(key_col).agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = spans.select(
        key_col,
        F.explode(F.expr(f"sequence(lo, hi, interval 1 {unit})")).alias(
            "slot"
        ),
    )
    joined = grid.join(obs, [key_col, "slot"], "left")
    w_back = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("v_obs", ignorenulls=True).over(w_back)
    prev_s = F.last(
        F.when(F.col("v_obs").isNotNull(), F.col("slot")), ignorenulls=True
    ).over(w_back)
    next_v = F.first("v_obs", ignorenulls=True).over(w_fwd)
    next_s = F.first(
        F.when(F.col("v_obs").isNotNull(), F.col("slot")), ignorenulls=True
    ).over(w_fwd)
    marked = joined.select(
        key_col,
        "slot",
        F.col("v_obs").isNotNull().alias("observed"),
        prev_v.alias("pv"),
        prev_s.alias("ps"),
        next_v.alias("nv"),
        next_s.alias("ns"),
    )
    delta = F.datediff(F.col("slot"), F.col("ps"))
    span = F.datediff(F.col("ns"), F.col("ps"))
    interp = F.col("pv") + F.floor(
        (F.col("nv") - F.col("pv")) * delta / span
    ).cast("long")
    return marked.select(
        key_col,
        "slot",
        F.when(F.col("ns").isNull() | (F.col("slot") == F.col("ps")), F.col("pv"))
        .otherwise(interp)
        .alias("v_interp_q"),
        "observed",
    )


def sax_words(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    series_len: int = 32,
    paa_segments: int = 8,
    quantize: int = 1000,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """SAX — Symbolic Aggregate approXimation (Lin et al., DMKD'03):
    each key's first ``series_len`` observations (time order, ties
    broken by ``tie_cols``) become one short SYMBOLIC WORD —
    z-normalize, average into ``paa_segments`` equal segments (PAA),
    map each segment mean to {a,b,c,d} via the N(0,1) quartile
    breakpoints (−0.6745, 0, 0.6745). Returns ``(key, word)``; keys
    with fewer than ``series_len`` observations are dropped (the
    fixed-length contract).

    This is the time-series SIBLING of the MinHash/SimHash blocking
    family: similar shapes get EQUAL words, so candidate pairs
    materialize inside a word equi-join — never an all-pairs scan —
    and a downstream exact-distance verify (or a DTW within word
    groups) runs on the candidate volume only. At 100 TB of series
    the word table is one short string per key.

    Engine-exact by construction (the oracle requirement): values are
    quantized to integers (``floor(v·quantize)``), every mean /
    variance / segment mean derives from EXACT integer sums with one
    closed-form float expression at the end, and the constant-series
    edge (variance exactly 0) pins z ≡ 0 — so no float summation
    order or boundary flip can differ across engines. ``series_len``
    must be divisible by ``paa_segments``."""
    if series_len % paa_segments != 0:
        raise ValueError(
            "sax_words: series_len must be divisible by paa_segments"
        )
    per_seg = series_len // paa_segments
    vq = F.floor(F.col(value_col) * quantize).cast("long")
    w = Window.partitionBy("__k").orderBy(ts_col, *tie_cols)
    sliced = (
        df.select(
            F.col(key_col).alias("__k"),
            F.col(ts_col),
            *[F.col(c) for c in tie_cols],
            vq.alias("__v"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= series_len)
    )
    # exact integer sums per key (mean/variance inputs) and per segment
    stats = sliced.groupBy("__k").agg(
        F.count("*").alias("__n"),
        F.sum("__v").alias("__s1"),
        F.sum(F.col("__v") * F.col("__v")).alias("__s2"),
    ).filter(F.col("__n") == series_len)
    segs = (
        sliced.withColumn(
            "__seg", ((F.col("__rn") - 1) / per_seg).cast("int")
        )
        .groupBy("__k", "__seg")
        .agg(F.sum("__v").alias("__ss"))
    )
    n = float(series_len)
    mean = F.col("__s1") / F.lit(n)
    var = F.col("__s2") / F.lit(n) - mean * mean
    # variance is exactly 0 iff all quantized values equal (integer
    # sums) — pin z to 0 there instead of dividing by 0
    paa_z = F.when(
        F.col("__s2") * F.lit(int(series_len))
        == F.col("__s1") * F.col("__s1"),
        F.lit(0.0),
    ).otherwise(
        (F.col("__ss") / F.lit(float(per_seg)) - mean) / F.sqrt(var)
    )
    sym = (
        F.when(paa_z < -0.6745, "a")
        .when(paa_z < 0.0, "b")
        .when(paa_z < 0.6745, "c")
        .otherwise("d")
    )
    return (
        segs.join(stats, "__k")
        .select("__k", "__seg", sym.alias("__sym"))
        .groupBy("__k")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__seg", "__sym"))
                    ),
                    lambda x: x["__sym"],
                ),
                "",
            ).alias("word")
        )
        .select(F.col("__k").alias(key_col), "word")
    )


def series_arrays(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    series_len: int = 32,
    quantize: int = 1000,
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Each key's first ``series_len`` observations (time order, ties
    by ``tie_cols``) as ONE quantized-integer array column — the
    fixed-length series extraction shared by SAX blocking and the
    exact verifies that run inside its candidate groups. Keys with
    fewer observations are dropped (same contract as
    :func:`sax_words`). Returns (key_col, seq: array<long>)."""
    w = Window.partitionBy("__k").orderBy(ts_col, *tie_cols)
    sliced = (
        df.select(
            F.col(key_col).alias("__k"),
            F.col(ts_col),
            *[F.col(c) for c in tie_cols],
            F.floor(F.col(value_col) * quantize).cast("long").alias("__v"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= series_len)
    )
    return (
        sliced.groupBy("__k")
        .agg(
            F.count("*").alias("__n"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("__rn", "__v"))),
                lambda x: x["__v"],
            ).alias("seq"),
        )
        .filter(F.col("__n") == series_len)
        .select(F.col("__k").alias(key_col), "seq")
    )


def dtw_pairs(
    pairs: DataFrame,
    seq_a_col: str = "seq_a",
    seq_b_col: str = "seq_b",
    band: int = 4,
    out_col: str = "dtw",
) -> DataFrame:
    """Exact Dynamic Time Warping distance per candidate pair, with a
    Sakoe–Chiba band of radius ``band`` (the standard constraint: the
    warping path stays within |i−j| ≤ band, which both regularizes
    and cuts the DP from O(n²) to O(n·band) per pair).

    Cost is L1 over the quantized-integer series from
    :func:`series_arrays`, so the whole DP is INTEGER arithmetic —
    the distance is exact and hash-stable with no float order anywhere.

    This is the verify stage of the SAX blocking pipeline: ``pairs``
    is a candidate frame (two array columns) produced by a word
    equi-join — volume bounded by the blocking, never all-pairs. The
    DP runs executor-side in mapInPandas (a declared pandas operator:
    an iterative recurrence is the one shape Spark expressions can't
    fold); each pair is O(n·band) on two short arrays, no shuffle
    beyond the candidate join itself.
    """
    import pandas as pd  # noqa: F401

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in pairs.schema.fields
        if f.name not in (seq_a_col, seq_b_col)
    ) + f", {out_col} long"

    def _dtw(a: list[int], b: list[int], r: int) -> int:
        big = None
        n, m = len(a), len(b)
        prev = [None] * (m + 1)
        prev[0] = 0
        for i in range(1, n + 1):
            cur = [None] * (m + 1)
            lo = max(1, i - r)
            hi = min(m, i + r)
            for j in range(lo, hi + 1):
                best = None
                for p in (prev[j], cur[j - 1], prev[j - 1]):
                    if p is not None and (best is None or p < best):
                        best = p
                if best is None:
                    continue
                cur[j] = best + abs(a[i - 1] - b[j - 1])
            prev = cur
        return prev[m]

    keep = [
        f.name
        for f in pairs.schema.fields
        if f.name not in (seq_a_col, seq_b_col)
    ]

    def _dtw_batch(A, B, r):
        # the SAME integer recurrence as _dtw, vectorized across the
        # PAIR axis (every pair advances its (i, j) cell in lockstep;
        # per-cell arithmetic is integer min/add, so results are
        # bit-identical to the scalar loop). Unreachable cells use a
        # BIG sentinel instead of None; BIG never enters an addition.
        import numpy as np

        P, n = A.shape
        m = B.shape[1]
        BIG = np.int64(1) << 62
        prev = np.full((P, m + 1), BIG, np.int64)
        prev[:, 0] = 0
        for i in range(1, n + 1):
            cur = np.full((P, m + 1), BIG, np.int64)
            lo = max(1, i - r)
            hi = min(m, i + r)
            ai = A[:, i - 1]
            for j in range(lo, hi + 1):
                best = np.minimum(
                    np.minimum(prev[:, j], cur[:, j - 1]), prev[:, j - 1]
                )
                cost = np.abs(ai - B[:, j - 1])
                cur[:, j] = np.where(best >= BIG, BIG, best + cost)
            prev = cur
        return prev[:, m], BIG

    def gen(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            la = pdf[seq_a_col].map(len).to_numpy()
            lb = pdf[seq_b_col].map(len).to_numpy()
            vals = [None] * len(pdf)
            # vectorize per uniform (len_a, len_b) group — the SAX
            # pipeline emits fixed-length series, so this is one
            # group per batch in practice
            for na, mb in {(int(x), int(y)) for x, y in zip(la, lb)}:
                idx = np.flatnonzero((la == na) & (lb == mb))
                A = np.array(
                    [pdf[seq_a_col].iat[i] for i in idx], np.int64
                ).reshape(len(idx), na)
                B = np.array(
                    [pdf[seq_b_col].iat[i] for i in idx], np.int64
                ).reshape(len(idx), mb)
                res, big = _dtw_batch(A, B, band)
                for k, i in enumerate(idx):
                    vals[i] = None if res[k] >= big else int(res[k])
            out = pdf[keep].copy()
            out[out_col] = pd.Series(vals, index=pdf.index, dtype="int64")
            yield out

    return pairs.mapInPandas(gen, schema=out_schema)
