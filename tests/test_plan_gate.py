"""Plan-shape regression gate (r6 verdict item 8): the committed
PLANS.md rows are the CONTRACT for the headline queries' physical
plans. Editing a query so that a filter stops pushing down, a
broadcast join degrades, a Python eval node sneaks in, or an
unpartitioned window appears must fail HERE — at pytest time against
the committed numbers — not three rounds later as a benchmark
mystery. An INTENTIONAL plan change is landed by regenerating
PLANS.md (`python tools/plan_report.py`), which makes the change
reviewable in the diff.

Only environment-stable stats are compared: broadcast/sort-merge join
counts, pushed-filter scan counts, Python eval nodes, and
unpartitioned windows. Scan and exchange counts stay informational in
PLANS.md but are not gated (AQE/partition-count sensitivity would
make them flaky across configs)."""

from __future__ import annotations

import re
from pathlib import Path

import pytest

GATED_KEYS = [
    ("broadcast_joins", 3),
    ("sortmerge_joins", 4),
    ("pushed_filters", 5),
    ("python_evals", 6),
    ("unpartitioned_windows", 7),
]


def _committed_rows() -> dict[str, list[str]]:
    text = Path(__file__).resolve().parent.parent.joinpath(
        "PLANS.md"
    ).read_text()
    rows = {}
    for line in text.splitlines():
        m = re.match(r"\| (q\d+\S*) \| (.+) \|$", line)
        if m:
            rows[m.group(1)] = [c.strip() for c in m.group(2).split("|")]
    return rows


def test_headline_plan_stats_match_committed(spark, sf_dir):
    from bench import HEADLINE
    from dataflowex_spark.plans import plan_stats
    from dataflowex_spark.queries import REGISTRY

    committed = _committed_rows()
    missing = [n for n in HEADLINE if n not in committed]
    assert not missing, (
        f"PLANS.md lacks rows for {missing} — regenerate with "
        "python tools/plan_report.py"
    )
    mismatches = {}
    for name in HEADLINE:
        want = committed[name]
        if want[0] == "—":
            continue  # committed as not-dry-plannable
        live = plan_stats(REGISTRY[name][0](spark, sf_dir))
        for key, col in GATED_KEYS:
            if col - 1 >= len(want):
                continue  # older PLANS.md without the column
            w = want[col - 1]
            if not w.isdigit():
                continue
            if live[key] != int(w):
                mismatches[f"{name}.{key}"] = (int(w), live[key])
    assert not mismatches, (
        "plan drift vs committed PLANS.md (committed, live): "
        f"{mismatches} — if intentional, regenerate PLANS.md"
    )


def test_spread_small_scan_cost_bound(spark, tmp_path):
    """spread_small_scan repartitions ONLY under its byte cap: tiny
    inputs gain core-count partitions; inputs over the cap (and
    file-less plans) pass through with the plan untouched."""
    from dataflowex_spark.plans import spread_small_scan

    p = str(tmp_path / "tiny.parquet")
    spark.range(0, 1000).write.parquet(p)
    tiny = spark.read.parquet(p)
    spread = spread_small_scan(tiny)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    assert spread.count() == 1000
    # over-cap: structural no-op (same plan object semantics)
    capped = spread_small_scan(tiny, cap_bytes=0)
    assert capped is tiny
    # no input files: no-op
    local = spark.createDataFrame([(1,)], "a int")
    assert spread_small_scan(local) is local
