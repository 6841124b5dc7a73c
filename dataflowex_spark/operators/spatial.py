"""Grid-blocked spatial operators.

The scale problem with a radius join ("all pairs within r") is the
same as near-dup detection: the naive form is an O(n²) cross join.
The standard fix — identical in spirit to geohash prefix joins and
to the LSH band join in ``operators/dedup.py`` — is to snap points
to a grid of cell size r, expand ONE side to its 3×3 neighbor
cells, and equi-join on the cell id: every true pair falls in some
neighbor cell, and candidate volume is density-bounded, never n².
Each true pair is produced exactly once (the left point's home cell
matches exactly one of the right point's nine shifted cells), so no
distinct pass is needed afterwards.

Coordinates are INTEGER (e.g. micro-degrees): the cell snap, the
squared distance, and the radius test are then exact integer
arithmetic — which is what lets the driver's DuckDB oracle verify
the blocked join against a literal all-pairs statement, and what
keeps the result independent of float rounding on any engine.

At 100 TB: points shuffle once on cell id (9× one side's volume);
a skewed cell (urban hot spot) is an ordinary hot-key problem the
repo's salting pattern applies to. No broadcast of the corpus, no
cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_radius_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All unordered pairs (a, b) with squared euclidean distance
    ≤ radius² on integer coordinates. Returns
    (<id>_a, <id>_b, dist2) with <id>_a < <id>_b.

    Cell size = radius ⇒ any pair within radius is within one cell
    step on each axis, so the 3×3 neighborhood is complete.
    """
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("long").alias("__y"),
    )
    cx = F.floor(F.col("__x") / F.lit(radius))
    cy = F.floor(F.col("__y") / F.lit(radius))
    left = pts.select(
        F.col("__id").alias("__ida"),
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    right = (
        pts.select(
            F.col("__id").alias("__idb"),
            F.col("__x").alias("__xb"),
            F.col("__y").alias("__yb"),
            cx.alias("__bx"),
            cy.alias("__by"),
        )
        .select("*", offs)
        .select(
            "__idb",
            "__xb",
            "__yb",
            (F.col("__bx") + F.col("o.dx")).alias("__cx"),
            (F.col("__by") + F.col("o.dy")).alias("__cy"),
        )
    )
    d2 = (F.col("__xa") - F.col("__xb")) * (
        F.col("__xa") - F.col("__xb")
    ) + (F.col("__ya") - F.col("__yb")) * (F.col("__ya") - F.col("__yb"))
    return (
        left.join(right, ["__cx", "__cy"])
        .where(F.col("__ida") < F.col("__idb"))
        .where(d2 <= F.lit(radius * radius).cast("long"))
        .select(
            F.col("__ida").alias(f"{id_col}_a"),
            F.col("__idb").alias(f"{id_col}_b"),
            d2.cast("long").alias("dist2"),
        )
    )
