"""Window-function operators: per-group top-k and gap sessionization."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number — the scalable per-group
    top-k (single shuffle on the partition keys; no global sort)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Gap-based sessionization (batch analog of session_window):
    a new session starts when the gap to the previous event of the
    same user exceeds ``gap_seconds``. session_id = running count of
    session-starts per user — two window passes over one shuffle
    keyed by user. ``tie_cols`` make the ordering total when
    timestamps collide."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *tie_cols)
    # µs-precision gap test (second-truncating casts would misclassify
    # gaps within 1s of the threshold); NTZ → TS is wall-clock
    # preserving under the engine's UTC session timezone
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return (
        df.withColumn("__new", is_new)
        .withColumn(
            session_col,
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("__new")
    )
