"""Replica repair runbook — the anti-entropy composition: Merkle
localization → range-scoped IBLT decode → keyed repair MERGE.

Two datacenters hold an orders table (here: two MTables). The
secondary drifts — a sparse stripe of corrupted prices, a stripe of
lost rows, a few phantom rows that never existed upstream. The
runbook repairs it the way Dynamo-style anti-entropy does, touching
data proportional to the DAMAGE, never the table:

1. **Localize** (q378 shape): both sides build a range Merkle tree
   (portable md5, bit-identical for identical data) and compare
   top-down. Only the diverging LEAF RANGES survive — everything
   else is proven equal by one digest compare per node.
2. **Decode** (q375 shape): within the flagged ranges only, each
   side encodes (key, row-digest) items and runs the full
   reconciliation ladder — strata sketch estimates the damage, the
   IBLT is sized 2× that and peeled (doubling on a stall). Sketch
   size is O(damage), and the flagged-range filter means the encode
   pass reads a sliver of the table.
3. **Map & repair**: decoded item hashes join back to real rows
   (again only inside flagged ranges): items present only on the
   primary are pushes (corrupted or lost rows — upserted via the
   MTable's file-pruned MERGE); secondary-only items whose key has
   no primary row are phantoms (deleted via the zero-scan equality
   delete). One MERGE + one delete_keys, both touching only
   key-range-affected files.
4. **Verify**: rebuild both trees — every level must compare clean.

Run: ``python -m examples.replica_repair_runbook [sf_dir]``
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.reconcile import merkle_tree, reconcile
from dataflowex_spark.sources.mtable import MTable

LEAF_WIDTH = 1024
FANOUT = 4
LEVELS = 4


def _digest(key_col, cents_col):
    return F.md5(
        F.concat(key_col.cast("string"), F.lit(":"), cents_col.cast("string"))
    )


def _item_hash(key_col, digest_col):
    """(key, row-digest) → 60-bit portable item id for the IBLT."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(key_col.cast("string"), F.lit("|"), digest_col)
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def _tree(df: DataFrame) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    keyed = df.select(
        F.col("o_orderkey").alias("k"),
        _digest(F.col("o_orderkey"), cents).alias("d"),
    )
    return merkle_tree(
        keyed, "k", F.col("d"),
        leaf_width=LEAF_WIDTH, fanout=FANOUT, levels=LEVELS,
    )


def _diverged_leaves(primary: DataFrame, secondary: DataFrame) -> list[int]:
    ta = _tree(primary).filter(F.col("level") == 0)
    tb = _tree(secondary).filter(F.col("level") == 0)
    bad = (
        ta.withColumnRenamed("digest", "ad")
        .join(
            tb.withColumnRenamed("digest", "bd"), ["level", "node_id"],
            "full_outer",
        )
        .filter(~F.col("ad").eqNullSafe(F.col("bd")))
        .select("node_id")
        .collect()
    )
    return sorted(int(r["node_id"]) for r in bad)


def run_runbook(spark: SparkSession, sf_dir: str) -> dict:
    cat = Catalog(spark, sf_dir)
    orders = cat["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    root = tempfile.mkdtemp(prefix="replica_runbook_")
    primary = MTable.create(
        spark, root + "/primary",
        orders.repartitionByRange(8, "o_orderkey"), "o_orderkey",
    )
    # the drifted secondary: corrupt a price stripe, lose a stripe,
    # invent phantoms beyond the real key range
    maxk = orders.agg(F.max("o_orderkey")).first()[0]
    drifted = (
        orders.filter(F.col("o_orderkey") % 7919 != 10)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7919 == 3,
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.limit(3).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(maxk) + 1000
            )
        )
    )
    secondary = MTable.create(
        spark, root + "/secondary",
        drifted.repartitionByRange(8, "o_orderkey"), "o_orderkey",
    )

    # -- 1. localize ------------------------------------------------
    leaves = _diverged_leaves(primary.read(), secondary.read())
    n_leaves_total = (
        primary.read()
        .select(
            F.floor(F.col("o_orderkey") / F.lit(LEAF_WIDTH)).alias("l")
        )
        .distinct()
        .count()
    )

    # -- 2. range-scoped IBLT decode -------------------------------
    def scoped_items(df: DataFrame) -> DataFrame:
        leaf = F.floor(F.col("o_orderkey") / F.lit(LEAF_WIDTH))
        return (
            df.filter(leaf.isin(leaves))
            .select(
                F.col("o_orderkey").alias("k"),
                _item_hash(
                    F.col("o_orderkey"),
                    _digest(F.col("o_orderkey"), cents),
                ).alias("item"),
            )
        )
    a_items = scoped_items(primary.read())
    b_items = scoped_items(secondary.read())
    # estimate -> size -> decode (the full protocol ladder)
    decoded = reconcile(a_items, b_items, "item")
    a_only = [it for it, side in decoded if side == "a_only"]
    b_only = [it for it, side in decoded if side == "b_only"]

    # -- 3. map decoded items back to rows and repair ---------------
    pushes = (
        a_items.filter(F.col("item").isin(a_only))
        .join(primary.read(), a_items["k"] == F.col("o_orderkey"))
        .drop("k", "item")
    )
    push_keys = pushes.select(F.col("o_orderkey").alias("k"))
    phantoms = (
        b_items.filter(F.col("item").isin(b_only))
        .select("k")
        .join(push_keys, "k", "left_anti")
    )
    n_push = pushes.count()
    n_phantom = phantoms.count()
    changes = pushes.select(
        "o_orderkey",
        *[c for c in pushes.columns if c != "o_orderkey"],
        F.lit(1).cast("long").alias("__ts"),
        F.lit("U").alias("__op"),
        F.lit(1).cast("long").alias("__tie"),
    )
    secondary.merge(
        changes, "__ts", "__op", "__tie",
        [c for c in pushes.columns if c != "o_orderkey"],
    )
    if n_phantom:
        secondary.delete_keys(phantoms.select(F.col("k").alias("o_orderkey")))

    # -- 4. verify --------------------------------------------------
    clean = len(_diverged_leaves(primary.read(), secondary.read())) == 0
    return {
        "leaves_flagged": len(leaves),
        "leaves_total": n_leaves_total,
        "items_decoded": len(decoded),
        "rows_pushed": n_push,
        "phantoms_deleted": n_phantom,
        "verified_clean": clean,
    }


if __name__ == "__main__":
    from dataflowex_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    s = get_spark("replica-repair-runbook")
    s.sparkContext.setLogLevel("ERROR")
    print(run_runbook(s, sf))
    s.stop()
