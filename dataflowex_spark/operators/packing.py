"""Sequence packing — binning documents into fixed-token-budget
training sequences (the "packing" step of an LLM pre-training
pipeline: concatenate short documents until the context window is
full to avoid padding waste).

Greedy next-fit, deterministic: within each packing group documents
are scanned in ascending id order; a document joins the current
sequence iff its tokens still fit the budget, else it starts a new
one. A document longer than the budget gets a sequence of its own
(truncation is the trainer's concern, not the packer's).

Scale shape: token counts are computed JVM-side FIRST, so only the
narrow (group, id, n_tokens) triple crosses Arrow into Python — the
document text never leaves the JVM. One shuffle on the group key
(the packing domain), then an O(n) sequential scan per group in
pandas. Groups are the parallelism unit: pick group granularity (or
the ``shards`` splitter) so no group outgrows one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataflowex_spark.operators.sampling import portable_bucket


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shards: int = 1,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each row a sequence number within its group by greedy
    next-fit packing. Returns (group_col, [shard], id_col,
    n_tokens_col, seq_col) — one row per input row.

    ``shards`` > 1 sub-splits each group by a portable hash of the id
    so a single huge group cannot serialize one task; shards pack
    independently (sequences never span shards, which training
    pipelines don't need anyway).
    """
    narrow = df.select(group_col, id_col, n_tokens_col)
    keys = [group_col]
    if shards > 1:
        narrow = narrow.withColumn("shard", portable_bucket(F.col(id_col), shards))
        keys.append("shard")

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in narrow.schema.fields
    ) + f", `{seq_col}` bigint"

    def pack(pdf):
        pdf = pdf.sort_values(id_col, ignore_index=True)
        seqs = []
        seq, acc = 0, 0
        for n in pdf[n_tokens_col]:
            n = int(n) if n == n else 0  # NaN-safe
            if seqs and acc + n > budget:
                seq += 1
                acc = n
            else:
                acc += n
            seqs.append(seq)
        pdf[seq_col] = seqs
        return pdf

    return narrow.groupBy(*keys).applyInPandas(pack, schema=schema)


def packing_stats(
    packed: DataFrame,
    group_col: str,
    n_tokens_col: str,
    budget: int,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Per-sequence fill report: docs per sequence, token total, and
    fill ratio against the budget — the padding-waste metric packing
    exists to optimize."""
    return packed.groupBy(group_col, seq_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens_col).cast("bigint").alias("seq_tokens"),
        (F.sum(n_tokens_col) / float(budget)).alias("fill_ratio"),
    )
