"""Round-5 skew stress probe: a ZIPF-distributed hot-key fixture
(P(key=k) ~ k^-2 via the inverse-power transform key=floor(1/u),
deterministic from xxhash64 — key 1 owns ~50% of rows, key 2 ~17%, a
long genuine tail) benched plain-vs-salted at 1x and 10x row counts.

Isolates the operators: AQE skew-join splitting and auto-broadcast
are DISABLED so the measured delta is the salting itself — the regime
the operators exist for (pre-shuffled / broadcast-resistant inputs
where AQE can't help).

Usage: python tools/skew_probe_r5.py  (prints a markdown table row set
for SCALE_NOTES.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflowex_spark.operators.skew import salted_agg, salted_join
from dataflowex_spark.session import get_spark


def zipf_events(spark, n_rows: int):
    """key = floor(1/u) capped at 1e5, u uniform from a portable hash:
    P(key=k) = 1/k - 1/(k+1) ~ k^-2 (zipf s=1 tail). Deterministic."""
    u = (F.abs(F.xxhash64(F.col("id"), F.lit(5))) % 1_000_000_000 + 1) / 1e9
    return (
        spark.range(n_rows)
        .select(
            F.least(F.floor(1.0 / u), F.lit(100_000)).cast("long").alias("k"),
            (F.col("id") % 1000).alias("v"),
            F.concat(F.lit("payload_"), F.col("id") % 97).alias("s"),
        )
    )


def timed(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    spark = get_spark()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    for scale, n in (("1x", 6_000_000), ("10x", 60_000_000)):
        ev = zipf_events(spark, n).localCheckpoint(eager=True)
        dim = (
            spark.range(100_001)
            .select(
                (F.col("id") + 1).alias("k"),
                F.concat(F.lit("dim_"), F.col("id")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        hot_share = (
            ev.filter(F.col("k") == 1).count() / n
        )
        print(f"== {scale}: {n} rows, hot-key share {hot_share:.2%}")

        t_plain_join = timed(
            lambda: ev.join(dim, "k").agg(F.count("*"), F.max("label")).collect()
        )
        t_salt_join = timed(
            lambda: salted_join(ev, dim, "k", n_salts=32)
            .agg(F.count("*"), F.max("label"))
            .collect()
        )
        print(
            f"join plain {t_plain_join:.2f}s vs salted(32) {t_salt_join:.2f}s"
        )

        t_plain_agg = timed(
            lambda: ev.groupBy("k")
            .agg(F.collect_list("s").alias("ss"))
            .select(F.max(F.size("ss")))
            .collect()
        )
        t_salt_agg = timed(
            lambda: salted_agg(
                ev,
                ["k"],
                {"n": F.count("*"), "mx": F.max("v")},
                n_salts=32,
            )
            .agg(F.max("n"))
            .collect()
        )
        # collect_list is not decomposable by salts; the salted
        # comparison for non-combinables keeps PER-SALT lists (the
        # operator-realistic form — re-concatenating the hot key's
        # full list on one reducer would just reconstruct the OOM the
        # salting avoided; at 10x the plain form heap-OOMs outright)
        t_salt_list = timed(
            lambda: ev.withColumn(
                "__salt", (F.rand(seed=7) * 32).cast("int")
            )
            .groupBy("k", "__salt")
            .agg(F.collect_list("s").alias("ss"))
            .groupBy("k")
            .agg(F.sum(F.size("ss")).alias("n_items"))
            .select(F.max("n_items"))
            .collect()
        )
        print(
            f"collect_list plain {t_plain_agg:.2f}s vs salted-2phase "
            f"{t_salt_list:.2f}s; decomposable salted_agg {t_salt_agg:.2f}s"
        )
        ev.unpersist()
        dim.unpersist()


if __name__ == "__main__":
    main()
