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
