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
