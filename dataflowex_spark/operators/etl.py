"""Flagship ETL operators — the reference's database surface, Spark-first.

- ``dim_join`` / ``dim_join_insert_missing``: DbDataJoiner semantics
  [R: Gridsum.DataflowEx/ETL/DbDataJoiner.cs # DbDataJoiner,
  DimTableInserter] — per-row dimension lookup with LRU cache and
  bulk insert-missing becomes: broadcast left equi-join + anti-join
  for the miss set + deterministic surrogate assignment + union-append.
  The reference's row cache is subsumed by broadcasting the dim table.
- ``sharded_sink``: MultiDbBulkInserter [R: Gridsum.DataflowEx/
  Databases/MultiDbBulkInserter.cs] — hash-shard routing becomes a
  partitioned write (each shard lands in its own directory/connection).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Dimension lookup (DbDataJoiner hit path): left-enrichment join.

    ``broadcast_dim=True`` is the scale default: dimension tables are
    small relative to facts, so a broadcast hash join avoids shuffling
    the 100 TB fact side entirely (the reference's in-memory LRU row
    cache, done properly).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=list(on) if not isinstance(on, str) else [on], how=how)


def dim_join_insert_missing(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    surrogate: str = "sk",
    dim_payload: Sequence[str] = (),
    dense: bool | str = "auto",
    dense_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """DbDataJoiner miss path: two-phase insert-missing + re-join.

    Returns ``(enriched_fact, updated_dim, inserted_keys)``:

    1. miss set   = distinct fact keys absent from dim (``left_anti`` —
       exactly the reference's DimTableInserter probe, with the same
       within-batch dedup via ``distinct``).
    2. surrogate  = ``max(existing sk) + dense rank over new keys``
       (deterministic per run — the analog of reading back DB identity
       values; documented caveat: two-phase append is not transactional
       without a MERGE-capable sink, same as the reference's
       non-atomic probe-then-insert).

       ``dense=True`` ranks via a global-ordered window — exact dense
       ids, but the *new-key set* funnels through one reducer; right
       when misses are rare (the common ETL case). ``dense=False``
       assigns ``max + zipWithIndex-style unique ids`` fully in
       parallel — right when a backfill introduces millions of new
       keys at once (ids stay deterministic given the same input
       partitioning, may have gaps). The default ``dense="auto"``
       counts the miss set (materialized via localCheckpoint, so the
       probe anti-join runs once) and picks dense iff it holds ≤
       ``dense_threshold`` keys — small misses get gap-free ids, a
       big backfill never funnels through one reducer.
    3. re-join    = broadcast left join of fact against the updated dim;
       every input row is emitted (left-enrichment semantics).
    """
    if surrogate not in dim.columns:
        dim = dim.withColumn(surrogate, F.lit(None).cast("long"))

    missing = (
        fact.select(key)
        .distinct()
        .join(dim.select(key), on=key, how="left_anti")
    )
    if dense == "auto":
        missing = missing.localCheckpoint()
        dense = missing.count() <= dense_threshold
    base = dim.agg(F.coalesce(F.max(surrogate), F.lit(0)).alias("m"))
    if dense:
        new_rows = (
            missing.crossJoin(F.broadcast(base))
            .withColumn(
                surrogate,
                F.col("m") + F.row_number().over(Window.orderBy(key)),
            )
            .drop("m")
        )
    else:
        # parallel unique ids: sort within partitions for determinism,
        # then offset each partition by the global running count
        # (classic zipWithIndex reshaped as DataFrame ops)
        parted = (
            missing.repartitionByRange(key)
            .sortWithinPartitions(key)
            .withColumn("__pid", F.spark_partition_id())
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__pid").orderBy(key)
                ),
            )
        )
        sizes = parted.groupBy("__pid").agg(F.max("__rn").alias("__cnt"))
        offsets = sizes.withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        ).select("__pid", "__off")
        new_rows = (
            parted.join(F.broadcast(offsets), "__pid")
            .crossJoin(F.broadcast(base))
            .withColumn(surrogate, F.col("m") + F.col("__off") + F.col("__rn"))
            .drop("__pid", "__rn", "__off", "m")
        )
    for c in dim.columns:
        if c not in new_rows.columns:
            new_rows = new_rows.withColumn(c, F.lit(None).cast(dim.schema[c].dataType))
    updated_dim = dim.unionByName(new_rows.select(dim.columns))
    enriched = dim_join(
        fact,
        updated_dim.select(key, surrogate, *dim_payload),
        on=key,
    )
    return enriched, updated_dim, new_rows.select(key, surrogate)


def shard_assign(df: DataFrame, key: str, n_shards: int, shard_col: str = "shard") -> DataFrame:
    """Deterministic shard id per row (MultiDbBulkInserter dispatch
    function). ``pmod(xxhash64(key), n)`` spreads skewed keys; callers
    that need an oracle-checkable shard can pass a numeric key and use
    plain modulo instead."""
    return df.withColumn(shard_col, F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int"))


def sharded_sink(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Horizontal write sharding: one directory per shard id.

    ``partitionBy(shard)`` gives each shard its own file set — on a
    cluster each would map to one JDBC connection / one downstream DB.
    ``repartition(shard)`` first so each task writes exactly one shard
    (no small-files explosion at 1000 executors).
    """
    sharded = shard_assign(df, key, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.format(fmt)
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tie_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one validity interval per run of consecutive equal attribute
    values per key (gaps-and-islands), ``valid_to`` NULL on the
    current row.

    Change detection is null-safe (``IS DISTINCT FROM`` semantics) and
    the ordering (ts, tie) must be total per key — a unique tie column
    makes island boundaries deterministic under timestamp ties.

    Scale shape: two windows and one aggregate, all partitioned by the
    dimension key — shuffles (key, ts, attr) triples only, no
    single-reducer stage. This is the history-building half the
    reference's DbBulkInserter-style sinks leave to the warehouse
    [SURVEY §2 A10-A12].
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    changed = ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
    run = (
        df.withColumn("__chg", F.when(changed, 1).otherwise(0))
        .withColumn(
            "__island",
            F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    islands = run.groupBy(key_col, "__island").agg(
        F.min(attr_col).alias(attr_col),  # constant within the island
        F.min(ts_col).alias(from_col),
        F.count("*").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("__island")
    return islands.select(
        key_col,
        attr_col,
        from_col,
        F.lead(from_col).over(w2).alias(to_col),
        "n_events",
    )


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    tie_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Apply a CDC changeset to a snapshot, latest-wins: for each key
    keep only the newest change by (ts, tie); op ``'D'`` deletes the
    key, any other op upserts ``value_cols`` (insert when the key is
    absent from the snapshot, update otherwise). Untouched snapshot
    rows pass through — the MERGE INTO of a warehouse, as one plan.

    Scale shape: the changeset collapses to one row per key via a
    ``max_by`` hash aggregate (no window sort), then a single keyed
    full join against the snapshot. A micro-batch-sized changeset
    broadcasts under AQE; a backfill-sized one shuffle-joins — both
    correct, Catalyst picks.
    """
    latest = changes.groupBy(key_col).agg(
        F.max_by(
            F.struct(op_col, *value_cols), F.struct(ts_col, tie_col)
        ).alias("__c")
    )
    merged = snapshot.alias("__s").join(
        latest.alias("__t"), on=key_col, how="full"
    )
    merged = merged.filter(
        F.col(f"__t.__c.{op_col}").isNull()
        | (F.col(f"__t.__c.{op_col}") != "D")
    )
    out_cols = [F.col(key_col)]
    for c in snapshot.columns:
        if c == key_col:
            continue
        if c in value_cols:
            out_cols.append(
                F.coalesce(F.col(f"__t.__c.{c}"), F.col(f"__s.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"__s.{c}").alias(c))
    for c in value_cols:
        if c not in snapshot.columns:
            out_cols.append(F.col(f"__t.__c.{c}").alias(c))
    return merged.select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a table by key: each output row carries
    ``status`` ∈ {added, removed, changed, unchanged} — the audit
    behind incremental publishing ('what did this backfill actually
    touch?').

    One keyed full join; change detection is null-safe per column, so
    NULL→value and value→NULL both count as changed. Returns the keys
    plus both sides of every compared column (``old_x`` / ``new_x``).
    """
    keys = list(key_cols)
    compare = list(compare_cols or [c for c in new.columns if c not in keys])
    o = old.select(
        *keys,
        F.lit(1).alias("__o"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("__n"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, keys, "full")
    same = None
    for c in compare:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("__o").isNull(), "added")
        .when(F.col("__n").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare],
        *[F.col(f"new_{c}") for c in compare],
    )


# ---------------------------------------------------------------------
# incremental aggregate maintenance
# ---------------------------------------------------------------------

# re-mergeable aggregate specs: agg name -> (partial expr builder,
# merge expr builder). AVG is maintained as (sum, count) and finalized
# on read — the classic decomposable-aggregate discipline.
_MERGEABLE = {
    "count": (
        lambda c: F.count(c),
        lambda p: F.sum(p),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda p: F.sum(p),
    ),
    "min": (
        lambda c: F.min(c),
        lambda p: F.min(p),
    ),
    "max": (
        lambda c: F.max(c),
        lambda p: F.max(p),
    ),
}


def partial_aggregate(
    batch: DataFrame, keys: list[str], spec: dict[str, list[str]]
) -> DataFrame:
    """Per-batch partial aggregate for :func:`merge_aggregate`.
    ``spec`` maps a column to the aggregates to maintain, e.g.
    ``{"amount": ["sum", "count", "min"]}``; output columns are named
    ``<col>_<agg>``."""
    aggs = []
    for col, fns in spec.items():
        for fn in fns:
            if fn not in _MERGEABLE:
                raise ValueError(
                    f"partial_aggregate: {fn!r} is not re-mergeable "
                    f"(supported: {sorted(_MERGEABLE)}); maintain AVG as "
                    "sum+count and finalize on read"
                )
            aggs.append(_MERGEABLE[fn][0](F.col(col)).alias(f"{col}_{fn}"))
    return batch.groupBy(*keys).agg(*aggs)


def merge_aggregate(
    state: DataFrame | None,
    batch_partial: DataFrame,
    keys: list[str],
    spec: dict[str, list[str]],
) -> DataFrame:
    """Incremental aggregate-table maintenance: fold a new batch's
    partial aggregate into the running state WITHOUT recomputing
    history — ``merge(state, partial(batch)) == aggregate(history ∪
    batch)`` for every decomposable aggregate in ``spec``.

    At 100 TB this is the difference between touching one batch and
    re-scanning the table: the state frame is keyed (one hash
    aggregate over state ∪ partial, partials combine map-side), and
    the identity is exactly Spark's own partial→final HashAggregate
    contract, applied across batches instead of within a job.
    Equivalence to the single-pass aggregate is property-tested.
    """
    if state is None:
        return batch_partial
    merged = state.unionByName(batch_partial)
    aggs = []
    for col, fns in spec.items():
        for fn in fns:
            name = f"{col}_{fn}"
            aggs.append(_MERGEABLE[fn][1](F.col(name)).alias(name))
    return merged.groupBy(*keys).agg(*aggs)


def distinct_sketch(
    batch: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of a batch (Apache DataSketches via
    ``hll_sketch_agg``) — the mergeable-state companion to
    :func:`partial_aggregate` for COUNT(DISTINCT): exact distinct is
    not decomposable, but the sketch is."""
    return batch.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias(f"{col}_hll")
    )


def merge_distinct_sketch(
    state: DataFrame | None, batch_sketch: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Fold a batch's HLL sketches into the running state:
    ``merge(state, sketch(batch))`` estimates EXACTLY what
    ``sketch(history ∪ batch)`` estimates (sketch union is lossless
    over sketches — property-tested), so incremental distinct counts
    never rescan history. Estimate with ``hll_sketch_estimate`` on
    read."""
    name = f"{col}_hll"
    if state is None:
        return batch_sketch
    return state.unionByName(batch_sketch).groupBy(*keys).agg(
        F.hll_union_agg(F.col(name)).alias(name)
    )


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    fact_ts: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time (temporal) join: enrich each fact row with the
    SCD2 history row valid at the fact's timestamp
    (``valid_from <= ts`` and ``ts < valid_to`` / open-ended NULL).
    The standard warehouse lookup against :func:`scd2_history` output.

    Scale shape: delegates to the union-interleave
    :func:`~dataflowex_spark.operators.joins.asof_join` on
    ``valid_from`` — one keyed shuffle, output == fact rows — instead
    of the key+inequality pair join that materializes facts×intervals
    per key. valid_from ties (zero-length intervals) resolve to the
    interval with the greatest valid_to (NULL = current wins) via a
    (is-null, valid_to) struct tie; the validity upper bound is then
    applied by NULLing the match where ``ts >= valid_to`` — which also
    gives gap semantics (a fact falling in a history gap matches
    nothing, it does not inherit the stale row).
    """
    from dataflowex_spark.operators.joins import asof_join

    tie = "__pit_tie"
    hist = history.withColumn(
        tie,
        F.struct(
            F.col(to_col).isNull().cast("int").alias("is_open"),
            F.col(to_col).alias("to"),
        ),
    )
    joined = asof_join(
        facts,
        hist,
        on=key,
        left_ts=fact_ts,
        right_ts=from_col,
        direction="backward",
        suffix=suffix,
        tie_break=tie,
    ).drop(tie + suffix)
    to_r = F.col(to_col + suffix)
    invalid = to_r.isNotNull() & (F.col(fact_ts) >= to_r)
    rpay = [c + suffix for c in history.columns if c != key]
    out = joined
    for c in rpay:
        out = out.withColumn(
            c, F.when(invalid, F.lit(None)).otherwise(F.col(c))
        )
    return out


def dim_join_insert_missing_persistent(
    fact: DataFrame,
    dim_path: str,
    key: str,
    surrogate: str = "sk",
    dim_payload: Sequence[str] = (),
    dense: bool | str = "auto",
    dense_threshold: int = 100_000,
    on_staged=None,
) -> DataFrame:
    """DbDataJoiner full cycle against a PERSISTENT dimension table:
    probe the on-disk dim, assign surrogates to the misses, publish
    the new dim rows, re-join — with the publish made CRASH-SAFE.

    The in-memory :func:`dim_join_insert_missing` documents the
    reference's own caveat: probe-then-insert is not transactional.
    This variant closes the torn-rerun hole for a parquet-backed dim:
    the new rows land through ``sources.incremental_append`` — staged
    write + atomic per-file rename + keyed anti-join on ``key`` — so

    - a crash BEFORE commit publishes nothing (staging is a sibling
      dir, invisible to readers);
    - a crash MID-commit leaves a key-prefix of the batch; the rerun's
      anti-join sees those keys as hits and appends only the
      remainder — convergent, never a duplicate surrogate for a key;
    - a clean rerun of the same fact batch appends nothing.

    Surrogate ids stay unique across reruns (each assignment starts
    above the CURRENT on-disk ``max(surrogate)``), but a torn run may
    leave gaps — same contract as a database identity column after a
    rolled-back insert. Returns the enriched fact (broadcast join
    against the re-read dim, left-enrichment semantics).

    ``on_staged`` is the crash-injection test hook, passed through to
    ``incremental_append``.
    """
    from dataflowex_spark.sources import incremental_append

    spark = fact.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dim_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        dim = spark.read.parquet(dim_path)
    else:
        key_type = fact.schema[key].dataType.simpleString()
        dim = spark.createDataFrame([], f"{key} {key_type}, {surrogate} long")

    _enriched, _updated, new_rows = dim_join_insert_missing(
        fact,
        dim,
        key=key,
        surrogate=surrogate,
        dense=dense,
        dense_threshold=dense_threshold,
    )
    incremental_append(
        new_rows.select(key, surrogate), dim_path, key, on_staged=on_staged
    )
    updated = spark.read.parquet(dim_path)
    return dim_join(
        fact, updated.select(key, surrogate, *dim_payload), on=key
    )


def incremental_join_delta(
    a_old: DataFrame | None,
    b_old: DataFrame | None,
    delta_a: DataFrame | None,
    delta_b: DataFrame | None,
    on: str | list[str],
) -> DataFrame | None:
    """Delta rule for INCREMENTAL JOIN maintenance:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    — the classic IVM identity (append-only inputs; deletes need the
    retraction variant). Returns just the NEW join rows for this
    batch, so downstream state merges stay proportional to the delta,
    never the accumulated join. None inputs mean "empty".

    Scale shape: each term is an ordinary equi-join Catalyst plans
    like any other (broadcast when a side is small, else shuffle on
    the key) — the win over recompute is that A_old ⋈ B_old, the
    quadratically-growing term, is NEVER re-executed. Pair with
    ``partial_aggregate``/``merge_aggregate`` to maintain join-over-
    aggregate views batch by batch."""
    terms = []
    if delta_a is not None and b_old is not None:
        terms.append(delta_a.join(b_old, on))
    if a_old is not None and delta_b is not None:
        terms.append(a_old.join(delta_b, on))
    if delta_a is not None and delta_b is not None:
        terms.append(delta_a.join(delta_b, on))
    if not terms:
        return None
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def consistent_hash_ring(
    spark, n_shards: int, vnodes: int = 16
) -> DataFrame:
    """The vnode ring for :func:`consistent_hash_owner`: n·v rows of
    (shard, pos) with pos = the repo's portable md5 bucket of
    'shard#<s>#vnode#<v>' in [0, 1e9). Tiny and broadcast-sized by
    construction — the ring is metadata, never data."""
    from dataflowex_spark.operators.sampling import portable_bucket

    rows = spark.range(n_shards).crossJoin(
        spark.range(vnodes).select(F.col("id").alias("v"))
    )
    label = F.concat(
        F.lit("shard#"),
        F.col("id").cast("string"),
        F.lit("#vnode#"),
        F.col("v").cast("string"),
    )
    return rows.select(
        F.col("id").cast("long").alias("shard"),
        portable_bucket(label, 1_000_000_000).alias("pos"),
    )


def consistent_hash_owner(
    df: DataFrame,
    key: str,
    n_shards: int,
    vnodes: int = 16,
    owner_col: str = "owner",
) -> DataFrame:
    """Consistent-hashing ownership (Karger ring): a key belongs to
    the vnode at the smallest ring position ≥ its own hash position
    (wrapping to the globally smallest vnode). Unlike ``pmod`` shard
    assignment (:func:`shard_assign`), growing the cluster from N to
    N+1 shards moves only ~1/(N+1) of the keys — the property the
    companion audit query verifies exactly.

    Plan shape: the ring is METADATA (n·v rows) — it is collected
    once (a bounded collect, same policy as bloom words / IVF cell
    lists), sorted, and inlined as a position-ordered CASE chain, so
    ownership is a pure scan-local expression: smallest ring position
    ≥ key-pos, wrapping to the ring head. Zero joins, zero shuffles,
    zero aggregates — per-row cost is a ≤n·v-branch comparison chain
    inside codegen, the shape that survives 100 TB of keys. All
    arithmetic is the portable integer hash, so any engine reproduces
    every assignment."""
    from dataflowex_spark.operators.sampling import portable_bucket

    ring = sorted(
        (r["pos"], r["shard"])
        for r in consistent_hash_ring(
            df.sparkSession, n_shards, vnodes
        ).collect()
    )
    # successor search as a CASE chain over the sorted ring (NOT a
    # higher-order filter(): HOF lambda variables hit Spark's
    # self-join attribute-dedup bug when the same owner frame sits on
    # both sides of a join, which is exactly the audit query's shape).
    # The hash is projected FIRST — referencing it inside every WHEN
    # branch would re-evaluate md5 per branch (conditionals defeat
    # common-subexpression elimination).
    keyed = (
        df.select(F.col(key))
        .distinct()
        .withColumn("__kpos", portable_bucket(F.col(key), 1_000_000_000))
    )
    # one FLAT CaseWhen (chained .when(), ascending positions: first
    # hit = smallest pos ≥ kpos) — nesting via .otherwise() builds a
    # 128-deep expression tree that falls out of codegen
    owner = F.when(
        F.col("__kpos") <= F.lit(ring[0][0]), F.lit(ring[0][1])
    )
    for pos, shard in ring[1:]:
        owner = owner.when(F.col("__kpos") <= F.lit(pos), F.lit(shard))
    owner = owner.otherwise(F.lit(ring[0][1]))  # wraparound
    return keyed.select(key, owner.cast("long").alias(owner_col))


def for_portion_of_update(
    df,
    start_col: str,
    end_col: str,
    portion_lo,
    portion_hi,
    set_values: dict,
):
    """SQL:2011 application-time ``UPDATE … FOR PORTION OF`` semantics
    (the temporal-table feature DB2/MariaDB implement natively):
    every validity period [start, end) overlapping the portion
    [lo, hi) SPLITS — the sub-period inside the portion takes the
    new values, the pieces outside keep the old row — so history
    stays contiguous and lossless. Rows not overlapping pass through
    untouched.

    Pure scan-local algebra: three filtered projections unioned —
    zero shuffles, zero UDFs; at 100 TB it is one map over the
    table, and when the portion bounds are literals the non-overlap
    branch's filter pushes to the scan. Periods are half-open;
    degenerate (empty) segments are dropped."""
    from pyspark.sql import functions as F

    lo = F.lit(portion_lo)
    hi = F.lit(portion_hi)
    s, e = F.col(start_col), F.col(end_col)
    overlap = (s < hi) & (e > lo)
    untouched = df.filter(~overlap)
    ov = df.filter(overlap)
    head = ov.filter(s < lo).withColumn(end_col, lo)
    mid = ov.withColumn(start_col, F.greatest(s, lo)).withColumn(
        end_col, F.least(e, hi)
    )
    for c, v in set_values.items():
        mid = mid.withColumn(c, v)
    tail = ov.filter(e > hi).withColumn(start_col, hi)
    return (
        untouched.unionByName(head)
        .unionByName(mid)
        .unionByName(tail)
    )
