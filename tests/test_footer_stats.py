"""Footer-derived file stats must be indistinguishable from the
Spark re-scan they replace (r11 optimization): same per-file rows /
min / max for every supported type, and an honest ``None`` (caller
falls back to the scan) for anything footers can't reproduce."""

import datetime as dt
import math
import os

import pytest
from pyspark.sql import functions as F, types as T

from dataflowex_spark.sources.footer_stats import footer_file_stats


def _scan_stats(spark, job, cols):
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
    out = {}
    for r in (
        spark.read.parquet(job)
        .groupBy(F.input_file_name().alias("__path"))
        .agg(*aggs)
        .collect()
    ):
        import re
        import urllib.parse as up

        p = up.unquote(re.sub(r"^file:/*", "/", r["__path"]))
        out[p] = {k: r[k] for k in r.asDict() if k != "__path"}
    return out


def test_footer_stats_match_scan_across_types(spark, tmp_path):
    job = str(tmp_path / "job")
    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5), True),
            (2, "omega", -2.25, dt.date(2023, 12, 31), dt.datetime(2023, 12, 31, 23, 59, 59), False),
            (3, None, None, None, None, None),
        ],
        "k long, s string, d double, dy date, ts timestamp, b boolean",
    )
    df.repartition(2).write.parquet(job)
    cols = ["k", "s", "d", "dy", "ts", "b"]
    got = footer_file_stats(job, cols)
    assert got is not None
    want = _scan_stats(spark, job, cols)
    assert len(got) == len(want)
    for e in got:
        w = want[e["path"]]
        assert e["__rows"] == w["__rows"]
        for c in cols:
            assert e[f"__mn_{c}"] == w[f"__mn_{c}"], (c, e, w)
            assert e[f"__mx_{c}"] == w[f"__mx_{c}"], (c, e, w)


def test_footer_stats_recursive_hive_layout(spark, tmp_path):
    job = str(tmp_path / "hive")
    df = spark.createDataFrame(
        [(i, f"s{i}", i % 3) for i in range(30)], "k long, s string, p int"
    )
    df.write.partitionBy("p").parquet(job)
    got = footer_file_stats(job, ["k", "s"], recursive=True)
    assert got is not None
    assert all(os.sep + "p=" in e["path"] for e in got)
    # totals line up with the data
    assert sum(e["__rows"] for e in got) == 30
    assert min(e["__mn_k"] for e in got) == 0
    assert max(e["__mx_k"] for e in got) == 29


def test_footer_stats_refuses_decimal(spark, tmp_path):
    job = str(tmp_path / "dec")
    spark.createDataFrame(
        [(1,)], "k long"
    ).select(F.col("k"), F.lit("1.50").cast("decimal(10,2)").alias("m")).write.parquet(job)
    assert footer_file_stats(job, ["m"]) is None
    # but the supported sibling column is still fine
    assert footer_file_stats(job, ["k"]) is not None


def test_footer_stats_refuses_nan_floats(spark, tmp_path):
    job = str(tmp_path / "nan")
    spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "k long, d double"
    ).coalesce(1).write.parquet(job)
    # Spark orders NaN above every double; footers can't promise that
    got = footer_file_stats(job, ["d"])
    if got is not None:
        # only acceptable if the footer itself reproduced Spark: max must be NaN
        assert all(math.isnan(e["__mx_d"]) for e in got)
    else:
        assert got is None


def test_footer_stats_all_null_column(spark, tmp_path):
    job = str(tmp_path / "nulls")
    spark.createDataFrame(
        [(1, None), (2, None)], "k long, s string"
    ).coalesce(1).write.parquet(job)
    got = footer_file_stats(job, ["s"])
    want = _scan_stats(spark, job, ["s"])
    if got is not None:
        for e in got:
            w = want[e["path"]]
            assert e["__mn_s"] == w["__mn_s"] is None
            assert e["__mx_s"] == w["__mx_s"] is None


def test_footer_stats_explicit_paths(spark, tmp_path):
    job = str(tmp_path / "explicit")
    spark.createDataFrame([(i,) for i in range(10)], "k long").coalesce(
        2
    ).write.parquet(job)
    files = sorted(
        str(tmp_path / "explicit" / f)
        for f in os.listdir(job)
        if f.endswith(".parquet")
    )
    got = footer_file_stats(job, ["k"], paths=files[:1])
    assert got is not None and len(got) == 1
    assert got[0]["path"] == files[0]
