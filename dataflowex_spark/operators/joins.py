"""Join operators Spark lacks natively: as-of and bounded range joins.

Both are expressed as compositions of built-in DataFrame ops so
Catalyst keeps optimizing around them (pushdown through the join
inputs, AQE on the shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
    tie_break: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the single right row with the
    largest ``right_ts`` ≤ ``left_ts`` (direction='backward'; 'forward'
    = smallest ≥), matching on equi-keys ``on``. Left rows with no
    match are preserved (left-join semantics). ``tie_break`` makes the
    pick among equal-timestamp right rows deterministic (max for
    backward, min for forward). ``tolerance`` (an interval literal,
    e.g. ``"1 HOUR"``) bounds staleness: a match farther than the
    tolerance from the left timestamp becomes NO match (nulled
    payload) — pandas ``merge_asof(tolerance=)`` semantics, the guard
    that stops a quote from three days ago pricing today's trade.

    Implementation — the union-interleave idiom, NOT a pair join:
    tag right rows 0 and left rows 1, union them into one frame, and
    run a single per-key window ordered by (ts, tag, tie) taking
    ``last(right_payload, ignorenulls=True)`` over the preceding rows.
    Each left row then carries exactly the nearest right row.

    Scale shape: ONE keyed shuffle (the window partition), O(1) state
    per row, and the operator's output cardinality is exactly
    ``left.count()`` — a pair-materializing backward join would build
    O(n·m) intermediate rows per key (every purchase × every earlier
    click) before discarding all but one per left row, which explodes
    on long per-key histories at 100 TB. Same shape as
    ``timeseries.resample_locf``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rpay = [c for c in right.columns if c not in keys]
    lcols = list(left.columns)

    # right rows with NULL ts can never satisfy the inequality — drop
    # them up front so nulls-first ordering can't surface one as a match
    r_nn = right.filter(F.col(right_ts).isNotNull())

    r_struct = F.struct(*[F.col(c).alias(c + suffix) for c in rpay])
    l_struct = F.struct(*[F.col(c) for c in lcols])
    # schema-only introspection (no job) to type the NULL struct on the
    # opposite side of the union
    r_type = r_nn.select(r_struct.alias("s")).schema[0].dataType
    l_type = left.select(l_struct.alias("s")).schema[0].dataType
    tie = F.col(tie_break) if tie_break is not None else F.lit(0)

    r_side = r_nn.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tie.alias("__tie"),
        F.lit(None).cast(l_type).alias("__lrow"),
        r_struct.alias("__rrow"),
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r_side.schema["__tie"].dataType).alias("__tie"),
        l_struct.alias("__lrow"),
        F.lit(None).cast(r_type).alias("__rrow"),
    )
    unioned = r_side.unionByName(l_side)

    if direction == "backward":
        # ts ascending, right(0) before left(1) at equal ts (≤ is
        # inclusive), ties ascending so the LAST right row seen at a
        # given ts is the max tie_break — matching the old desc pick.
        # asc puts NULL left ts first → no preceding right row → no
        # match, mirroring the inequality's NULL semantics.
        order = [F.col("__ts").asc_nulls_first(), F.col("__tag").asc(),
                 F.col("__tie").asc()]
    else:
        # scan from the future backwards: the last right row seen
        # before a left row is the smallest right_ts ≥ left_ts; ties
        # descending so last-seen = min tie_break.
        order = [F.col("__ts").desc_nulls_first(), F.col("__tag").asc(),
                 F.col("__tie").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        m_ts = F.col("__m").getField(right_ts + suffix)
        if direction == "backward":
            fresh = m_ts.isNotNull() & (F.col("__ts") <= m_ts + tol)
        else:
            fresh = m_ts.isNotNull() & (m_ts <= F.col("__ts") + tol)
        matched = matched.withColumn("__m", F.when(fresh, F.col("__m")))
    return matched.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{c}{suffix}").alias(c + suffix) for c in rpay],
    )


def asof_join_pairs(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_r",
    tie_break: str | None = None,
) -> DataFrame:
    """Reference implementation of :func:`asof_join` via the naive
    pair-materializing plan (equi-join on keys + time inequality, then
    ``row_number`` picks the nearest match per left row).

    Kept ONLY as the equivalence-test oracle: it builds O(n·m)
    intermediate rows per key before discarding all but one per left
    row, which is quadratic in per-key history length and must not be
    used at scale. Use :func:`asof_join`.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id())
    rsel = right.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[
            F.col(c).alias(c + suffix)
            for c in right.columns
            if c not in keys
        ],
    )
    cond = None
    for k in keys:
        c = l[k] == rsel[f"__k_{k}"]
        cond = c if cond is None else (cond & c)
    rts = F.col(right_ts + suffix)
    time_cond = rts <= l[left_ts] if direction == "backward" else rts >= l[left_ts]
    joined = l.join(rsel, cond & time_cond, "left")
    order = [rts.desc()] if direction == "backward" else [rts.asc()]
    if tie_break is not None:
        # deterministic pick among right rows with equal timestamps
        tb = F.col(tie_break + suffix)
        order.append(tb.desc() if direction == "backward" else tb.asc())
    w = Window.partitionBy(lid).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", lid, *[f"__k_{k}" for k in keys])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: pairs where ``right_ts`` ∈ [left_ts+lower,
    left_ts+upper], matching on equi-keys.

    The equi-keys carry the shuffle; the interval is a post-join
    filter Catalyst evaluates inside the join. For keyless range
    joins — or when one key is hot enough to swamp its reducer —
    use :func:`range_join_binned`, which manufactures a time-bin
    equi-key instead.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rsel = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(c + suffix) for c in right.columns if c not in keys],
    )
    rts = F.col(right_ts + suffix)
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    return left.join(rsel, on=keys, how="inner").where((rts >= lo) & (rts <= hi))


_INTERVAL_CACHE: dict[str, int] = {}


def _interval_micros(df: DataFrame, interval: str) -> int:
    """Length of an SQL interval string in microseconds (evaluated by
    Spark itself so every format Spark accepts is supported; memoized —
    the one-row job runs once per distinct string per process)."""
    if interval not in _INTERVAL_CACHE:
        row = (
            df.sparkSession.range(1)
            .select(
                (
                    F.unix_micros(
                        F.expr(
                            f"TIMESTAMP'1970-01-01 00:00:00Z' + INTERVAL {interval}"
                        )
                    )
                ).alias("us")
            )
            .first()
        )
        _INTERVAL_CACHE[interval] = int(row["us"])
    return _INTERVAL_CACHE[interval]


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    on: str | Sequence[str] | None = None,
    suffix: str = "_r",
    bucket_width: str | None = None,
) -> DataFrame:
    """Interval join via time-bin bucketing — the scale path for
    KEYLESS range joins and for hot equi-keys, where
    :func:`range_join`'s shuffle would put every row (or every hot-key
    row) on one reducer.

    Both sides are bucketed by ``floor(epoch / width)`` with
    ``width ≥ upper − lower``: a left row's interval then overlaps at
    most two adjacent bins, so the left side explodes into ≤ 2 rows,
    the right side lands in exactly one bin, and the pair shows up in
    exactly one shared bin (no post-join dedup needed). The join is a
    plain equi-join on (``__bin``, *keys) — shuffled by bin, parallel
    regardless of key skew — with the exact interval applied inside.

    Result set is identical to :func:`range_join`; the only trade is
    the ≤2× left-side explode. ``bucket_width`` defaults to the
    interval span.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    lower_us = _interval_micros(left, lower)
    upper_us = _interval_micros(left, upper)
    if upper_us < lower_us:
        raise ValueError(f"range_join_binned: upper {upper!r} < lower {lower!r}")
    width_us = (
        _interval_micros(left, bucket_width)
        if bucket_width is not None
        else max(upper_us - lower_us, 1)
    )
    if width_us < upper_us - lower_us:
        raise ValueError(
            "range_join_binned: bucket_width narrower than the interval span "
            "(a left interval would overlap >2 bins)"
        )

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    lo_bin = F.floor((l_us + lower_us) / width_us)
    hi_bin = F.floor((l_us + upper_us) / width_us)
    l = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))

    rsel = right.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(c + suffix) for c in right.columns if c not in keys],
    )
    r_us = F.unix_micros(F.col(right_ts + suffix).cast("timestamp"))
    r = rsel.withColumn("__bin", F.floor(r_us / width_us))

    rts = F.col(right_ts + suffix)
    lo = F.col(left_ts) + F.expr(f"INTERVAL {lower}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {upper}")
    return (
        l.join(r, on=["__bin", *keys], how="inner")
        .where((rts >= lo) & (rts <= hi))
        .drop("__bin")
    )


class JoinSizeExceeded(ValueError):
    """Raised by :func:`guarded_join` when the predicted output
    cardinality breaks the caller's budget — BEFORE the join runs."""


def predict_join_rows(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> dict:
    """Exact equi-join output cardinality WITHOUT running the join:
    |A ⋈ B| = Σ_k cntA(k)·cntB(k) from the two per-key count
    profiles, plus the unmatched-side terms for outer variants. The
    profiles are map-side-combined aggregations and the key-matched
    multiply-sum joins two frames of at most |distinct keys| rows —
    the cost of asking "how big is this join" never includes
    materializing it. Null keys never match an equi-join and are
    counted with the unmatched rows.

    Returns ``{"rows", "n_left", "n_right", "matched"}``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    pa = left.groupBy(*keys).agg(F.count("*").alias("__na"))
    pb = right.groupBy(*keys).agg(F.count("*").alias("__nb"))
    prof = pa.join(pb, keys, "full")
    both = F.col("__na").isNotNull() & F.col("__nb").isNotNull()
    row = prof.agg(
        F.coalesce(
            F.sum(F.when(both, F.col("__na") * F.col("__nb"))), F.lit(0)
        ).alias("matched"),
        F.coalesce(
            F.sum(F.when(F.col("__nb").isNull(), F.col("__na"))), F.lit(0)
        ).alias("left_extra"),
        F.coalesce(
            F.sum(F.when(F.col("__na").isNull(), F.col("__nb"))), F.lit(0)
        ).alias("right_extra"),
        F.coalesce(F.sum("__na"), F.lit(0)).alias("n_left"),
        F.coalesce(F.sum("__nb"), F.lit(0)).alias("n_right"),
    ).collect()[0]
    matched = int(row["matched"])
    extra = {
        "inner": 0,
        "left": int(row["left_extra"]),
        "leftouter": int(row["left_extra"]),
        "left_outer": int(row["left_extra"]),
        "right": int(row["right_extra"]),
        "rightouter": int(row["right_extra"]),
        "right_outer": int(row["right_extra"]),
        "full": int(row["left_extra"]) + int(row["right_extra"]),
        "fullouter": int(row["left_extra"]) + int(row["right_extra"]),
        "full_outer": int(row["left_extra"]) + int(row["right_extra"]),
        "outer": int(row["left_extra"]) + int(row["right_extra"]),
    }
    if how not in extra:
        raise ValueError(f"predict_join_rows: unsupported how={how!r}")
    return {
        "rows": matched + extra[how],
        "matched": matched,
        "n_left": int(row["n_left"]),
        "n_right": int(row["n_right"]),
    }


def guarded_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    max_rows: int | None = None,
    max_amplification: float | None = 8.0,
) -> DataFrame:
    """Equi-join with a CARDINALITY GUARD: predict the exact output
    size first (one aggregation pass per side — the question a human
    sizing a 100 TB join asks anyway) and raise
    :class:`JoinSizeExceeded` instead of launching a join that would
    explode. The classic pipeline failure this prevents: a fact-fact
    join keyed on an unexpectedly non-unique column quietly producing
    10^12 rows and taking the cluster down three stages later — the
    guard turns that into an immediate, explainable error.

    ``max_rows`` bounds the absolute output; ``max_amplification``
    bounds output/max(|left|, |right|). Either may be None to skip.
    When the guard passes, returns exactly ``left.join(right, on,
    how)`` — Catalyst sees the plain join, so broadcast/AQE/pushdown
    behave as usual.
    """
    stats = predict_join_rows(left, right, on, how)
    biggest = max(stats["n_left"], stats["n_right"], 1)
    if max_rows is not None and stats["rows"] > max_rows:
        raise JoinSizeExceeded(
            f"guarded_join: predicted {stats['rows']:,} output rows "
            f"(left={stats['n_left']:,}, right={stats['n_right']:,}) "
            f"> max_rows={max_rows:,}"
        )
    if (
        max_amplification is not None
        and stats["rows"] > max_amplification * biggest
    ):
        raise JoinSizeExceeded(
            f"guarded_join: predicted {stats['rows']:,} rows amplifies the "
            f"larger input ({biggest:,}) by "
            f"{stats['rows'] / biggest:.1f}x > {max_amplification}x"
        )
    return left.join(right, on, how)
