"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry at a given sf_dir, runs the matching
``oracle_sql()`` in DuckDB on the same parquet, and compares:
row count, schema (column names), and an order-insensitive value
comparison (sorted rows, NaN-safe, exact equality — both sides are
expected to round their floats).

Usage:
    python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dataflowex_spark.catalog import TABLES  # noqa: E402
from dataflowex_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    try:
        # exact: the driver hashes values, so bit-identical is the bar
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        msg = str(e).split("\n")
        problems.append(" | ".join(msg[:4]))
        # show a few mismatching rows for debugging
        try:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                idx = a.index[bad][:3]
                for i in idx:
                    problems.append(f"  spark:{a.loc[i].to_dict()}")
                    problems.append(f"  duck :{b.loc[i].to_dict()}")
        except Exception:
            pass
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("selfcheck")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    names = only or list(qs)
    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name} (rows-only: {len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"ok   {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
