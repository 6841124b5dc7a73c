"""Schema utilities — TypeAccessor parity (SURVEY §1).

The reference compiles a nested object graph into flat DB columns via
reflection: nested reference-type properties expand recursively to
``A.B.C`` paths with null-safe navigation
[R: Gridsum.DataflowEx/Databases/TypeAccessor.cs # TypeAccessor].

Spark's analog: a ``StructType`` walk that projects every leaf of a
nested schema to a flat column. Null-safe navigation is native —
``F.col("a.b.c")`` is NULL whenever any struct on the path is NULL —
so the flatten is a pure projection (codegen'd, zero-cost at scan;
column pruning still reaches parquet for untouched leaves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DataType, StructType


def leaf_paths(schema: StructType) -> list[tuple[tuple[str, ...], DataType]]:
    """Leaf paths of a (possibly nested) schema as name-part tuples →
    dataType, in schema order. Arrays/maps are leaves (their element
    structure is element-wise, not row-wise — explode first if you
    need to flatten through them)."""
    out: list[tuple[tuple[str, ...], DataType]] = []

    def walk(prefix: tuple[str, ...], dtype: DataType) -> None:
        if isinstance(dtype, StructType):
            for f in dtype.fields:
                walk(prefix + (f.name,), f.dataType)
        else:
            out.append((prefix, dtype))

    walk((), schema)
    return out


def schema_paths(schema: StructType, sep: str = ".") -> list[tuple[str, DataType]]:
    """:func:`leaf_paths` with display-joined names (``a.b.c``)."""
    return [(sep.join(parts), dtype) for parts, dtype in leaf_paths(schema)]


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Project every nested struct leaf to a top-level column named by
    its ``sep``-joined path — the deep-property expansion the
    reference performs for DB mapping, with identical null-safe
    semantics (a NULL struct anywhere on the path yields NULL).

    Arrays and maps stay as leaves: flattening through collections
    changes row multiplicity (that is ``Pipeline.flat_map``'s job,
    not a schema mapping's).
    """
    cols = []
    for parts, _ in leaf_paths(df.schema):
        c = F.col("`" + "`.`".join(parts) + "`")
        cols.append(c.alias(sep.join(parts)))
    return df.select(*cols)


__all__ = ["flatten", "leaf_paths", "schema_paths"]
