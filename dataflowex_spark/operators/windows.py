"""Window-function operators: per-group top-k and gap sessionization."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_TRIANGULAR_MAX_PARTS = 1024
"""Partition-count bound under which the per-partition offset frame
may use the lazy triangular self-join (≤ ~1M intermediate rows — a
bounded constant; zero extra jobs). Above it — cluster partition
counts — the P×P join is the wrong shape and offsets come from an
O(P) driver prefix scan over the collected counts (guide §5 bounded
metadata; r11 verdict item 4)."""


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


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row numbers WITHOUT a single-reducer
    window (``Window.orderBy`` with no partitionBy funnels every row
    through one task — Spark itself warns).

    Scale shape: range-repartition on the ordering (parallel sort),
    per-partition row_number, then offset each partition by the
    cumulative size of its predecessors. The offset frame is
    #partitions rows — bounded metadata: a lazy triangular self-join
    while P is small (bounded intermediate), an O(P) DRIVER prefix
    scan broadcast back at cluster partition counts (guide §5) — so
    the WHOLE plan carries zero unpartitioned WindowExec nodes (the
    same shape as :func:`global_cumsum`, plan-audited). Requires a
    total ordering for a deterministic result (same contract as
    row_number itself).
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__pid").orderBy(*order_by)),
        )
        # parted is referenced twice (rows + the offsets aggregate);
        # without the checkpoint Catalyst re-inlines the whole
        # upstream per reference, which COMPOUNDS when ntiles chain
        # (q212's three-deep chain planned 256 scans / 564 exchanges)
        .localCheckpoint(eager=False)
    )
    counts = parted.groupBy("__pid").agg(F.max("__rn").alias("__cnt"))
    # offsets = exclusive prefix sums of the ≤ #partitions-row counts
    # frame. P is a BUILD-TIME int, so pick the shape by it:
    # - P ≤ _TRIANGULAR_MAX_PARTS: the lazy triangular self-join
    #   (pid_b < pid_a) — ≤ ~1M intermediate BNLJ rows, a bounded
    #   constant, zero extra jobs, the whole operator stays lazy.
    # - larger P (cluster parallelism): the P×P join is the wrong
    #   shape (r11 verdict item 4) — collect the P-row counts
    #   (bounded driver metadata, guide §5; one tiny job over the
    #   already-checkpointed input), exclusive-prefix-scan in pid
    #   order on the driver, broadcast the P-row offsets back: O(P).
    if parts <= _TRIANGULAR_MAX_PARTS:
        a, b = counts.alias("__a"), counts.alias("__b")
        offsets = (
            a.join(b, F.col("__b.__pid") < F.col("__a.__pid"), "left")
            .groupBy(F.col("__a.__pid").alias("__pid"))
            .agg(F.coalesce(F.sum("__b.__cnt"), F.lit(0)).alias("__off"))
        )
    else:
        acc = 0
        offs = []
        for r in sorted(counts.collect(), key=lambda r: r["__pid"]):
            offs.append((r["__pid"], acc))
            acc += r["__cnt"]
        offsets = df.sparkSession.createDataFrame(
            offs, "__pid int, __off long"
        )
    return (
        parted.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__rn")).cast("int"))
        .drop("__pid", "__rn", "__off")
    )


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[Column],
    cols: Sequence[str],
    include_current: bool = True,
    suffix: str = "_cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sums over a total ordering WITHOUT any
    unpartitioned WindowExec — the scale-safe replacement for
    ``F.sum(c).over(Window.orderBy(...))``, which funnels every row
    through one task.

    Shape: range-repartition on the ordering (parallel sort),
    per-partition running sum (WindowExec partitioned by the physical
    partition id), then add each partition's offset — the sum of all
    STRICTLY EARLIER partitions' totals. The offsets derive from the
    ≤ #partitions-row totals frame: a lazy triangular self-join while
    P is small, an O(P) DRIVER prefix scan (bounded metadata, guide
    §5) broadcast back at cluster partition counts — either way NO
    window node at all, so a plan audit can assert
    ``unpartitioned_windows == 0``.

    ``include_current=False`` gives the exclusive prefix (the
    ``rowsBetween(unboundedPreceding, -1)`` frame), 0 for the first
    row. Each ``c`` in ``cols`` gains a ``f"{c}{suffix}"`` column.

    Contract: ``order_by`` must be a total order (unique keys — e.g.
    a DISTINCT-value compacted frame) for per-row results to be
    deterministic; sums over tied keys would be order-dependent.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        # referenced twice (rows + totals) — see global_row_number
        .localCheckpoint(eager=False)
    )
    end = 0 if include_current else -1
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = parted.select(
        "*",
        *[
            F.coalesce(F.sum(c).over(w), F.lit(0)).alias(f"__loc_{c}")
            for c in cols
        ],
    )
    totals = parted.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in cols]
    )
    # offsets = per-column exclusive prefix sums of the ≤ #partitions-
    # row totals frame. Same shape-by-P hybrid as global_row_number:
    # the lazy triangular self-join under _TRIANGULAR_MAX_PARTS (a
    # bounded constant of intermediate rows, zero extra jobs), the
    # O(P) driver prefix scan above it (guide §5 bounded metadata;
    # r11 verdict item 4 — the P×P BNLJ is the wrong shape at 100 TB
    # partition counts). Driver accumulation runs in pid order
    # (deterministic; every in-repo consumer prefix-sums integer
    # counts, so offsets are exact either way).
    if parts <= _TRIANGULAR_MAX_PARTS:
        a, b = totals.alias("__a"), totals.alias("__b")
        offsets = (
            a.join(b, F.col("__b.__pid") < F.col("__a.__pid"), "left")
            .groupBy(F.col("__a.__pid").alias("__pid"))
            .agg(
                *[
                    F.coalesce(F.sum(f"__b.__tot_{c}"), F.lit(0)).alias(
                        f"__off_{c}"
                    )
                    for c in cols
                ]
            )
        )
        return local.join(F.broadcast(offsets), "__pid").select(
            *df.columns,
            *[
                (F.col(f"__loc_{c}") + F.col(f"__off_{c}")).alias(
                    f"{c}{suffix}"
                )
                for c in cols
            ],
        )
    tot_types = {
        f.name: f.dataType.simpleString() for f in totals.schema.fields
    }

    def _typed(v, t):
        # createDataFrame verifies types: hand double/decimal columns
        # their own zero/accumulator representation, not a Python int
        if t in ("double", "float"):
            return float(v)
        if t.startswith("decimal"):
            from decimal import Decimal

            return v if isinstance(v, Decimal) else Decimal(v)
        return v

    acc = {c: 0 for c in cols}
    offs = []
    for r in sorted(totals.collect(), key=lambda r: r["__pid"]):
        offs.append(
            tuple(
                [r["__pid"]]
                + [_typed(acc[c], tot_types[f"__tot_{c}"]) for c in cols]
            )
        )
        for c in cols:
            t = r[f"__tot_{c}"]
            if t is not None:  # all-NULL partition contributes 0
                acc[c] += t
    offsets = df.sparkSession.createDataFrame(
        offs,
        ", ".join(
            ["__pid int"]
            + [f"__off_{c} {tot_types[f'__tot_{c}']}" for c in cols]
        ),
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        *df.columns,
        *[
            (F.col(f"__loc_{c}") + F.col(f"__off_{c}")).alias(f"{c}{suffix}")
            for c in cols
        ],
    )


def global_ntile(
    df: DataFrame,
    n: int,
    order_by: Sequence[Column],
    out_col: str = "ntile",
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY …)`` semantics at scale: global
    rank via :func:`global_row_number` plus the closed-form NTILE
    bucket formula — no all-rows-to-one-reducer WindowExec.

    NTILE splits N rows into n tiles; the first ``N % n`` tiles get
    ``N div n + 1`` rows, the rest ``N div n``.
    """
    def ceil_div(a: Column, b: Column) -> Column:
        # exact integer ceil(a/b): numerator made divisible first, so
        # the one float division is exact and the cast can't truncate
        num = a + b - 1
        return ((num - num % b) / b).cast("long")

    ranked = global_row_number(df, order_by, rank_col="__rank")
    total = ranked.agg(F.count("*").alias("__n"))
    r = F.col("__rank").cast("long")
    rem = F.col("__n") % n  # this many leading tiles get one extra row
    small = ((F.col("__n") - rem) / n).cast("long")
    big = small + 1
    cut = rem * big  # ranks 1..cut live in the "big" tiles
    tile = F.when(small == F.lit(0), r).otherwise(
        F.when(r <= cut, ceil_div(r, big)).otherwise(
            rem + ceil_div(r - cut, small)
        )
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, tile.cast("int"))
        .drop("__rank", "__n")
    )


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
