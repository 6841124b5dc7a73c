"""Round-11b scale probe: ROW-TRACKED append cost vs table age.

Every row-tracked Delta append reads the rowIdHighWaterMark (a log
replay bounded by delta.checkpointInterval) and every row-tracked
Iceberg v3 append stamps first-row-id from next-row-id (O(1) from
metadata). The question at 100 TB: does append wall-clock stay FLAT
as commits accumulate, or does watermark bookkeeping grow with
history? Appends N batches to a row-tracked Delta table and a v3
Iceberg table, recording wall per append at the start, middle, and
end of the run. Writes SCALE_PROBE_r11b.json.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from dataflowex_spark.session import get_spark  # noqa: E402
import dataflowex_spark.sources.delta_reader as dr  # noqa: E402
import dataflowex_spark.sources.iceberg_reader as ir  # noqa: E402


def probe_delta(spark, commits: int) -> list[float]:
    root = tempfile.mkdtemp(prefix="rtprobe_") + "/t"
    walls = []
    for c in range(commits):
        df = (
            spark.range(c * 1000, c * 1000 + 1000)
            .selectExpr("id as k", "cast(id as double) as x")
            .repartition(2)
        )
        t0 = time.monotonic()
        if c == 0:
            dr.write_delta(
                spark, df, root,
                configuration={"delta.enableRowTracking": "true"},
            )
        else:
            dr.write_delta(spark, df, root, mode="append")
        walls.append(time.monotonic() - t0)
    hwm = dr._row_id_high_water_mark(spark, root)
    assert hwm == commits * 1000 - 1, hwm
    return walls


def probe_iceberg(spark, commits: int) -> list[float]:
    root = tempfile.mkdtemp(prefix="rtprobe_") + "/t"
    walls = []
    for c in range(commits):
        df = (
            spark.range(c * 1000, c * 1000 + 1000)
            .selectExpr("id as k", "cast(id as double) as x")
            .repartition(2)
        )
        t0 = time.monotonic()
        ir.write_iceberg(
            spark, df, root,
            mode="error" if c == 0 else "append",
            format_version=3,
        )
        walls.append(time.monotonic() - t0)
    assert ir.load_table_metadata(root)["next-row-id"] == commits * 1000
    return walls


def summarize(walls: list[float], cp_interval: int = 10) -> dict:
    """Median per third over NON-checkpoint appends (a checkpoint
    write every cp_interval commits is amortized maintenance, not
    the steady-state append cost), checkpoint commits separately."""
    import statistics

    plain = [
        w for i, w in enumerate(walls)
        if i > 0 and (i + 1) % cp_interval != 0
    ]
    cps = [
        w for i, w in enumerate(walls)
        if i > 0 and (i + 1) % cp_interval == 0
    ]
    third = max(1, len(plain) // 3)
    return {
        "commits": len(walls),
        "first_third_median_s": round(
            statistics.median(plain[:third]), 3
        ),
        "mid_third_median_s": round(
            statistics.median(plain[third : 2 * third]), 3
        ),
        "last_third_median_s": round(
            statistics.median(plain[2 * third :]), 3
        ),
        "checkpoint_commit_median_s": round(
            statistics.median(cps), 3
        ) if cps else None,
    }


def main() -> None:
    out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else "SCALE_PROBE_r11b.json"
    spark = get_spark()
    res = {
        "delta_row_tracked_appends": summarize(probe_delta(spark, 60)),
        "iceberg_v3_appends": summarize(probe_iceberg(spark, 60)),
        "note": (
            "flat last/first ratio = watermark bookkeeping does not "
            "grow with table history (Delta: checkpointInterval-"
            "bounded replay; Iceberg: next-row-id is O(1) metadata)"
        ),
    }
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
