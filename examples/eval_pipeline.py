"""End-to-end MODEL-EVAL pipeline — scoring what the data pipeline
produced (companion to corpus_pipeline.py / embedding_pipeline.py):

1. score quality: does the value signal separate purchases? (tie-aware
   ROC AUC over cent-quantized scores);
2. calibration: reliability table + expected-calibration-error gap,
   then an isotonic (PAV) remap that makes the score a probability;
3. drift gates: Kolmogorov–Smirnov and PSI between the reference and
   current populations — the "don't ship this batch" alarms;
4. leakage-safe split surfaces: group k-fold (portable-hash folds)
   feeding the eval loop.

Every stage is a library operator (operators/mleval.py); the run
report is one dict a pipeline owner reads top-to-bottom: AUC, ECE,
isotonic bucket count, KS, PSI, fold balance.
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.mleval import (
    isotonic_calibration,
    ks_statistic,
    population_stability_index,
    roc_auc,
)
from dataflowex_spark.operators.sampling import portable_bucket


def run_eval_pipeline(spark: SparkSession, sf_dir: str) -> dict:
    cat = Catalog(spark, sf_dir)
    ev = cat["events"]
    label = F.col("event_type") == "purchase"
    score = F.floor(F.col("value") * 100).cast("long")

    auc_row = roc_auc(ev, label=label, score=score).collect()[0]

    iso = isotonic_calibration(ev, score=score, label=label)
    iso_rows = iso.count()

    ks_row = ks_statistic(
        ev.filter(F.col("event_type").isin("click", "view")),
        group=F.col("event_type") == "click",
        value=score,
    ).collect()[0]

    psi_row = population_stability_index(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        value=score,
    ).collect()[0]

    folds = (
        ev.select(
            F.pmod(portable_bucket(F.col("user_id"), 10_000), F.lit(5)).alias(
                "fold"
            )
        )
        .groupBy("fold")
        .count()
        .collect()
    )
    fold_counts = {int(r["fold"]): int(r["count"]) for r in folds}

    return {
        "auc": float(auc_row["auc"]),
        "n_pos": int(auc_row["n_pos"]),
        "isotonic_buckets": int(iso_rows),
        "ks_click_vs_view": float(ks_row["ks"]),
        "psi_click_vs_view": float(psi_row["psi"]),
        "fold_counts": fold_counts,
    }


if __name__ == "__main__":
    from dataflowex_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("eval-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_eval_pipeline(spark, sf)
    for k, v in report.items():
        print(f"{k}: {v}")
    spark.stop()
