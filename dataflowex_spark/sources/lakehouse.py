"""Format-agnostic lakehouse entry points: detect-and-read any table
this engine writes (Delta, Iceberg, MTable, plain parquet), and a
tiny named catalog so pipelines address tables by NAME — the "switch
a reader without touching the query" veneer the per-format readers
compose under.

Detection is by the formats' own on-disk markers (cheap, no file
reads beyond a listdir):

- ``_delta_log/``  → Delta (:func:`delta_reader.read_delta`)
- ``metadata/vN.metadata.json`` → Iceberg
  (:func:`iceberg_reader.read_iceberg`)
- ``_v/`` + ``_CURRENT`` → MTable (:class:`mtable.MTable`)
- otherwise → plain parquet directory (native scan)

Time-travel kwargs pass through to the matching reader (``version=``
for Delta/MTable, ``snapshot_id=``/``timestamp_ms=``/``ref=`` for
Iceberg); kwargs a format doesn't support refuse loudly rather than
silently ignoring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def detect_table_format(path: str) -> str:
    """'delta' | 'iceberg' | 'mtable' | 'parquet' by on-disk marker."""
    if os.path.isdir(os.path.join(path, "_delta_log")):
        return "delta"
    md = os.path.join(path, "metadata")
    if os.path.isdir(md) and any(
        fn.startswith("v") and fn.endswith(".metadata.json")
        for fn in os.listdir(md)
    ):
        return "iceberg"
    if os.path.isdir(os.path.join(path, "_v")) and os.path.exists(
        os.path.join(path, "_CURRENT")
    ):
        return "mtable"
    return "parquet"


def read_table(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Read ``path`` through whichever reader its format needs."""
    fmt = detect_table_format(path)
    if fmt == "delta":
        from dataflowex_spark.sources.delta_reader import read_delta

        return read_delta(spark, path, **kwargs)
    if fmt == "iceberg":
        from dataflowex_spark.sources.iceberg_reader import (
            read_iceberg,
        )

        return read_iceberg(spark, path, **kwargs)
    if fmt == "mtable":
        from dataflowex_spark.sources.mtable import MTable

        t = MTable(spark, path)
        version = kwargs.pop("version", None)
        if kwargs:
            raise ValueError(
                f"MTable read does not take {sorted(kwargs)}"
            )
        return t.read(version=version)
    if kwargs:
        raise ValueError(
            f"plain parquet read does not take {sorted(kwargs)}"
        )
    return spark.read.parquet(path)


class LakehouseCatalog:
    """Name → (path, detected format). ``table(name)`` reads through
    the right reader; ``sql(query)`` registers every table as a temp
    view (``<prefix><name>``) and runs ONE Spark SQL statement over
    any mix of formats — Catalyst sees ordinary scans after each
    format's metadata resolution, so cross-format joins plan like
    native reads."""

    def __init__(self, spark: SparkSession, view_prefix: str = ""):
        self.spark = spark
        self.view_prefix = view_prefix
        self._tables: dict[str, str] = {}

    def register(self, name: str, path: str) -> str:
        """Register and return the detected format."""
        fmt = detect_table_format(path)
        self._tables[name] = path
        return fmt

    def tables(self) -> dict[str, str]:
        return dict(self._tables)

    def table(self, name: str, **kwargs) -> DataFrame:
        if name not in self._tables:
            raise KeyError(
                f"table {name!r} not registered "
                f"(have: {sorted(self._tables)})"
            )
        return read_table(self.spark, self._tables[name], **kwargs)

    def sql(self, query: str) -> DataFrame:
        for name in self._tables:
            self.table(name).createOrReplaceTempView(
                self.view_prefix + name
            )
        return self.spark.sql(query)
