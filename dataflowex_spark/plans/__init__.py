"""Plan inspection helpers — the engine's monitoring surface.

Replaces DataflowEx's block monitor / StatisticsRecorder reporting
([R: Gridsum.DataflowEx/DataflowOptions.cs # FlowMonitorEnabled])
with Catalyst-plan introspection: did the filter push down, did the
small side broadcast, how wide are the codegen stages.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_stats(df: DataFrame, execute: bool = False) -> dict:
    """Quick structural audit of the physical plan.

    With AQE enabled the pre-execution plan carries no codegen
    annotations (isFinalPlan=false); pass ``execute=True`` to run the
    plan first so codegen_stages reflects the final adaptive plan.
    """
    if execute:
        # collect() runs THIS df's own QueryExecution so AQE reaches
        # isFinalPlan=true (count()/write would plan separate QEs);
        # audit-time only — use on test-scale frames
        df.collect()
    plan = formatted_plan(df)
    simple = formatted_plan(df, "simple")
    return {
        "scans": len(re.findall(r"Scan parquet", plan)),
        "unpartitioned_windows": unpartitioned_windows(plan),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "pushed_filters": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "python_evals": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan)),
    }


def unpartitioned_windows(plan: str) -> int:
    """Count WindowExec specs with NO partition keys — the
    all-rows-to-one-reducer shape that silently serializes at scale
    (Spark itself warns 'No Partition Defined'). In explain text a
    window spec is ``windowspecdefinition(part…, order… ASC/DESC,
    specifiedwindowframe(...))``; when the FIRST argument is already
    an ordering (``… ASC``/``… DESC``) or the frame itself, the
    partition list is empty. Counted per plan LINE (explain prints
    one Arguments/spec line per Window node; a node repeating its
    spec across several window functions counts once)."""
    n = 0
    for line in plan.splitlines():
        for m in re.finditer(r"windowspecdefinition\(([^,)]*)", line):
            first = m.group(1).strip()
            if first.startswith("specifiedwindowframe") or re.search(
                r"\b(ASC|DESC)\b", first
            ):
                n += 1
                break
    return n


def assert_pushdown(df: DataFrame, must_broadcast: bool = False) -> dict:
    """Bench-time guard: fails loudly if a plan lost its pushed filters
    or an expected broadcast join degraded to SMJ at small scale."""
    s = plan_stats(df)
    if s["scans"] and not s["pushed_filters"]:
        raise AssertionError(f"no pushed filters in plan: {s}")
    if must_broadcast and not s["broadcast_joins"]:
        raise AssertionError(f"expected a broadcast join: {s}")
    return s
