"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in :mod:`dataflowex_spark` — this module is
the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this module from any CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from dataflowex_spark import queries as _q
from dataflowex_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation: lineitem ⋈ orders ⋈ customer
    ⋈ nation ⋈ region → groupBy/sum) on /root/testdata/sf0.001."""
    configure(spark)
    fn, _sql = _q.REGISTRY["q20_join_inner_multi"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted ⇒ rows-only)."""
    return _q.oracle_sql()
