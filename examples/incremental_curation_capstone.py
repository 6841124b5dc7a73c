"""CAPSTONE: one INCREMENTAL curation run composing the storage,
dedup, and packing layers end-to-end — the proof the parts compose
into the pipeline a 100 TB pre-training corpus actually runs daily:

1. the curated corpus lives in an **MTable** (manifest-versioned
   parquet) and its near-dup knowledge in a **persisted LSH index**
   (bucketed band-signature table) — both built ONCE;
2. a new crawl batch arrives as CDC and **MERGEs** into the MTable —
   copy-on-write, only key-range-affected files rewritten;
3. the incremental work-list is the **manifest-diff changefeed**
   (``read_changes``): inserted/updated docs only — the carried 99%
   of the corpus is never re-read, which is the whole point;
4. the changefeed **probes the LSH index in place** (only the batch
   is signed and shuffled; the index never moves), near-dups are
   rejected, novel docs are **appended to the index** (bucketing
   preserved);
5. admitted docs are **mixture-rebalanced** to the target source
   shares (scan-side hash selection, corpus never shuffles) and
   **greedily packed** into fixed token budgets — the training-ready
   increment.

Every stage reports wall seconds and (when the Spark UI is enabled)
the shuffle bytes it moved, read from the REST status API — the
observable that distinguishes "reshuffled the corpus" from
"shuffled only the increment". Run standalone:

    python examples/incremental_curation_capstone.py [sf_dir]

Design cross-references: MTable commit protocol
``sources/mtable.py``; changefeed semantics q295; LSH index lifecycle
q292/q299; mixture q120; packing q118.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.dedup import (
    lsh_index_append,
    lsh_index_build,
    lsh_index_probe,
)
from dataflowex_spark.operators.packing import pack_sequences
from dataflowex_spark.operators.sampling import rebalance_mixture
from dataflowex_spark.sources.mtable import MTable


def _shuffle_bytes(spark: SparkSession) -> int | None:
    """Cumulative shuffle-write bytes for the app, via the UI REST
    API (None when the UI is disabled, as in the test session)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return None
    try:
        app = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages", timeout=10
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def run_incremental_curation(
    spark: SparkSession, sf_dir: str, workdir: str
) -> dict:
    cat = Catalog(spark, sf_dir)
    docs = cat["documents"]
    report: dict = {"stages": {}}

    def stage(name):
        class _S:
            def __enter__(self):
                self.t0 = time.time()
                self.b0 = _shuffle_bytes(spark)
                return self

            def __exit__(self, *exc):
                wall = round(time.time() - self.t0, 2)
                b1 = _shuffle_bytes(spark)
                delta = (
                    b1 - self.b0
                    if (b1 is not None and self.b0 is not None)
                    else None
                )
                report["stages"][name] = {
                    "wall_s": wall,
                    "shuffle_bytes": delta,
                }

        return _S()

    # ------------------------------------------------------------------
    # 1. standing state: corpus MTable + persisted LSH index
    # ------------------------------------------------------------------
    corpus = docs.filter(F.col("doc_id") % 3 != 2)
    with stage("build_mtable"):
        table = MTable.create(
            spark,
            os.path.join(workdir, "corpus"),
            corpus.repartitionByRange(16, "doc_id"),
            "doc_id",
        )
        v0 = table.current_version()
    idx_name = f"capstone_lsh_{uuid.uuid4().hex[:8]}"
    with stage("build_lsh_index"):
        lsh_index_build(
            corpus, os.path.join(workdir, "lsh"), idx_name, bands=8
        )

    # ------------------------------------------------------------------
    # 2. a new crawl batch MERGEs in: genuinely new docs plus exact
    #    re-crawls of existing ones (the changefeed must carry both;
    #    the LSH probe must reject the re-crawls' near-dups). New
    #    crawl doc ids sit ABOVE the standing key range — the normal
    #    append-mostly shape — so the merge carries every standing
    #    file by reference and rewrites only the insert files.
    # ------------------------------------------------------------------
    fresh = docs.filter(F.col("doc_id") % 3 == 2).withColumn(
        "doc_id", F.col("doc_id") + 20_000_000
    )
    recrawl = (
        corpus.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    batch = fresh.unionByName(recrawl)
    chg = batch.select(
        "doc_id",
        F.lit(1).alias("ts"),
        F.lit("I").alias("op"),
        F.lit(0).alias("tie"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    with stage("cdc_merge"):
        v1 = table.merge(
            chg, "ts", "op", "tie", ["text", "lang", "source", "n_chars"]
        )
    m = table.manifest()
    report["merge"] = {
        "version": v1,
        "files_total": len(m["files"]),
        "files_carried": len(
            {e["path"] for e in table.manifest(v0)["files"]}
            & {e["path"] for e in m["files"]}
        ),
    }

    # ------------------------------------------------------------------
    # 3. incremental work-list: the manifest-diff changefeed
    # ------------------------------------------------------------------
    with stage("changefeed"):
        feed = table.read_changes(v0, v1).filter(
            F.col("op").isin("I", "U")
        )
        feed = feed.localCheckpoint(eager=True)  # consumed twice below
        n_feed = feed.count()
    report["changefeed_rows"] = n_feed

    # ------------------------------------------------------------------
    # 4. near-dup gate against the standing index; admit + append
    # ------------------------------------------------------------------
    with stage("lsh_probe_admit"):
        dups = lsh_index_probe(
            feed, idx_name, jaccard_threshold=0.8
        )
        admitted = feed.join(
            dups.select(F.col("id_new").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)
        n_admitted = admitted.count()
        lsh_index_append(admitted, idx_name)
    report["near_dup_rejected"] = n_feed - n_admitted
    report["admitted"] = n_admitted

    # ------------------------------------------------------------------
    # 5. mixture rebalance + sequence packing of the increment
    # ------------------------------------------------------------------
    with stage("mixture_pack"):
        mixed = rebalance_mixture(
            admitted,
            "source",
            "doc_id",
            # target shares over three of the fixture's sources; the
            # rest are dropped (curation chooses its mixture)
            {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        )
        packed = pack_sequences(
            mixed.withColumn(
                "n_tokens", (F.col("n_chars") / 4).cast("long")
            ),
            "source",
            "doc_id",
            "n_tokens",
            budget=512,
            shards=2,
        )
        util = (
            packed.groupBy("source", "shard", "seq_id")
            .agg(F.sum("n_tokens").alias("fill"))
            .agg(
                F.count("*").alias("n_seqs"),
                F.round(F.avg("fill") / 512.0, 3).alias("avg_fill"),
            )
            .first()
        )
    report["packed"] = {
        "n_sequences": util["n_seqs"],
        "avg_fill": util["avg_fill"],
    }

    # ------------------------------------------------------------------
    # 6. takedown: a GDPR/opt-out list lands as a MERGE-ON-READ delete
    #    — deletion vectors record row positions, ZERO data files are
    #    rewritten (the report pins it), and the changefeed carries
    #    the D rows so downstream consumers (the LSH index, feature
    #    stores) can retract. Maintenance folds heavy DVs only.
    # ------------------------------------------------------------------
    with stage("takedown_dv"):
        paths_before = {e["path"] for e in table.manifest()["files"]}
        v2 = table.delete_where("doc_id % 97 = 11")
        m2 = table.manifest()
        retracted = (
            table.read_changes(v1, v2)
            .filter(F.col("op") == "D")
            .count()
            if v2
            else 0
        )
        folded = table.apply_deletion_vectors(min_ratio=0.3)
    report["takedown"] = {
        "dv_version": v2,
        "rows_deleted": sum(
            e.get("dv_rows", 0) for e in m2["files"]
        ),
        "files_rewritten_by_delete": len(
            {e["path"] for e in m2["files"]} - paths_before
        ),
        "changefeed_retractions": retracted,
        "dv_fold_version": folded,
    }
    assert report["takedown"]["files_rewritten_by_delete"] == 0
    report["total_wall_s"] = round(
        sum(s["wall_s"] for s in report["stages"].values()), 2
    )
    if all(
        s["shuffle_bytes"] is not None for s in report["stages"].values()
    ):
        report["total_shuffle_mb"] = round(
            sum(s["shuffle_bytes"] for s in report["stages"].values())
            / 1e6,
            1,
        )
    # cleanup the index table registration (data dies with workdir)
    for t in (idx_name, f"{idx_name}_tomb"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    return report


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")  # for the shuffle report
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .appName("incremental-curation-capstone")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory(prefix="capstone_") as wd:
        print(
            json.dumps(run_incremental_curation(spark, sf, wd), indent=2)
        )
    spark.stop()
