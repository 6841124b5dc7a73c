"""Fixture catalog: load the TPC-H-ish star schema + LLM-data tables.

Mirrors the reference's source stage (DataflowEx ``ProcessAsync`` over
an ``IEnumerable`` — [R: Gridsum.DataflowEx/Dataflow.cs # ProcessAsync])
as declarative parquet scans: Catalyst gets predicate pushdown, column
pruning and row-group skipping for free, which is the 100 TB-scale
replacement for push-based ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from dataflowex_spark.session import configure

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# dimension tables small enough to broadcast at ANY scale factor
# (region=5, nation=25 rows forever; supplier/part/customer grow with
# sf but stay well under the broadcast threshold at bench scale).
BROADCAST_DIMS = {"region", "nation", "supplier"}


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) → read as long ns under
    ``nanosAsLong`` → convert to timestamp_ntz (µs; fixture values are
    µs-granular so the narrowing is exact)."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV: double division would lose precision at 1.7e18 ns
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
        )
    return df


class Catalog:
    """Loads fixture tables from an ``sf_dir`` and registers temp views.

    Usage::

        cat = Catalog(spark, "/root/testdata/sf0.01")
        li  = cat.table("lineitem")     # DataFrame
        cat.register_views()            # spark.sql("... FROM lineitem")
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = configure(spark)
        self.sf_dir = sf_dir.rstrip("/")
        # cache DataFrames ON the session object (parquet footer
        # listing repeated per query is pure planning overhead): the
        # cache dies with its session, so entries can never outlive
        # the SparkContext their plans are bound to
        if not hasattr(spark, "_dataflowex_table_cache"):
            spark._dataflowex_table_cache = {}
        self._cache: dict[tuple[str, str], DataFrame] = (
            spark._dataflowex_table_cache
        )

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown fixture table: {name}")
        key = (self.sf_dir, name)
        if key not in self._cache:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            if name == "events":
                df = _normalize_events(df)
            self._cache[key] = df
        return self._cache[key]

    def __getitem__(self, name: str) -> DataFrame:
        return self.table(name)

    def register_views(self) -> None:
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return Catalog(spark, sf_dir).table(name)
