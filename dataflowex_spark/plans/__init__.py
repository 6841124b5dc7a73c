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


def column_lineage(df: DataFrame) -> dict[str, set[tuple[str, str]]]:
    """COLUMN-LEVEL LINEAGE from the analyzed logical plan: for every
    output column, the set of (source_table, source_column) leaves it
    derives from — the impact-analysis/governance surface ("which
    outputs move if lineitem.l_discount changes semantics?") that a
    plan-first engine gets for free, because Catalyst's resolved
    attributes carry stable exprIds end to end.

    Walk: post-order over the operator tree; parquet/file relations
    seed each leaf attribute with (basename(path), column);
    Project/Aggregate/Window map each NamedExpression's exprId to the
    union of its ``references()``' origins (Catalyst computes the
    reference set — no manual expression-tree walking); Union merges
    children positionally; everything else (joins, filters, sorts,
    limits, subquery aliases) passes attributes through unchanged —
    same exprId, same origin. Non-file leaves (inline/local
    relations, streaming sources) tag as ``("<local>", col)``;
    columns whose origin can't be established resolve to
    ``("<unresolved>", col)`` rather than silently vanishing.

    Driver-side plan analysis only — nothing executes."""
    import os

    def seq(s):
        return [s.apply(i) for i in range(s.size())]

    origin: dict[int, set[tuple[str, str]]] = {}

    def named_origin(ne) -> set[tuple[str, str]]:
        out: set[tuple[str, str]] = set()
        for r in seq(ne.references().toSeq()):
            out |= origin.get(
                r.exprId().id(), {("<unresolved>", r.name())}
            )
        return out

    def visit(node) -> None:
        for ch in seq(node.children()):
            visit(ch)
        cls = node.getClass().getSimpleName()
        if cls == "LogicalRelation":
            try:
                paths = seq(node.relation().location().rootPaths())
                src = ",".join(
                    os.path.splitext(os.path.basename(str(p)))[0]
                    for p in paths
                )
            except Exception:
                src = "<local>"
            for a in seq(node.output()):
                origin[a.exprId().id()] = {(src, a.name())}
        elif cls in ("LocalRelation", "OneRowRelation", "Range"):
            for a in seq(node.output()):
                origin[a.exprId().id()] = {("<local>", a.name())}
        elif cls == "Project":
            for ne in seq(node.projectList()):
                origin[ne.exprId().id()] = named_origin(ne)
        elif cls == "Aggregate":
            for ne in seq(node.aggregateExpressions()):
                origin[ne.exprId().id()] = named_origin(ne)
        elif cls == "Window":
            for ne in seq(node.windowExpressions()):
                origin[ne.exprId().id()] = named_origin(ne)
        elif cls == "Generate":
            gen_refs: set[tuple[str, str]] = set()
            for r in seq(node.generator().references().toSeq()):
                gen_refs |= origin.get(
                    r.exprId().id(), {("<unresolved>", r.name())}
                )
            for a in seq(node.generatorOutput()):
                origin[a.exprId().id()] = set(gen_refs)
        elif cls == "Union":
            outs = seq(node.output())
            kids = [seq(ch.output()) for ch in seq(node.children())]
            for i, a in enumerate(outs):
                merged: set[tuple[str, str]] = set()
                for k in kids:
                    ka = k[i]
                    merged |= origin.get(
                        ka.exprId().id(), {("<unresolved>", ka.name())}
                    )
                origin[a.exprId().id()] = merged
        # all other operators pass attributes through by exprId

    plan = df._jdf.queryExecution().analyzed()
    visit(plan)
    return {
        a.name(): origin.get(
            a.exprId().id(), {("<unresolved>", a.name())}
        )
        for a in seq(plan.output())
    }


def local_rows_df(spark, rows, schema, slices: int = 1) -> DataFrame:
    """Driver-built small DataFrame with a BOUNDED partition count.

    ``spark.createDataFrame(list)`` parallelizes the rows into
    defaultParallelism pickled slices; any later single-task consumer
    (a ``coalesce(1)`` metadata write, a coalesced fixture stage)
    then drains every slice SEQUENTIALLY, paying a fresh Python
    worker round-trip per slice — measured ~6 s to write an 8-row
    centroid file on local[32] (~0.19 s × 32 slices). Creating the
    frame with ``slices`` partitions up front removes that tax; row
    order is the list order either way, so downstream bytes are
    identical."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=max(1, slices)),
        schema=schema,
    )


def spread_small_scan(
    df: DataFrame, parts: int | None = None, cap_bytes: int = 64 << 20
) -> DataFrame:
    """Unlock core-count parallelism for CPU-heavy work over a TINY
    input without ever risking a large shuffle.

    Parquet scan parallelism is bounded by row groups: a fixture (or
    a badly-written upstream table) stored as ONE row group pins the
    whole downstream map stage — tokenize/explode/decode — to one
    task regardless of split configuration, stranding 31 of 32
    cores. The durable fix is WRITE-time row-group sizing; read-side,
    the only remedy is a shuffle, which must never be applied to a
    100 TB corpus. So this helper is adaptive with a hard cost bound:
    it repartitions ONLY when the plan's entire file footprint
    (driver-side metadata, no data read) is at most ``cap_bytes`` —
    one cluster block's worth, a trivially cheap shuffle — and is a
    structural no-op otherwise. At scale the condition is false by
    construction and the plan is untouched."""
    import os as _os

    files = df.inputFiles()
    if not files:
        return df
    total = 0
    for f in files:
        local = re.sub(r"^file:/*", "/", f)
        try:
            total += _os.stat(local).st_size
        except OSError:
            return df  # non-local storage: stay out of the way
        if total > cap_bytes:
            return df
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)
