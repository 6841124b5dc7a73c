"""Similarity search over embedding columns (array<float>).

Two tiers:
- ``knn_cosine_exact``: brute-force cosine top-k for a *small* probe
  set — probes broadcast to every partition of the (huge) corpus, so
  the corpus never shuffles; per-probe top-k via window. Correctness
  baseline and perfectly adequate when |probes| is small.
- ``knn_cosine_lsh``: random-hyperplane LSH bucketing — corpus and
  probes hashed into sign-pattern buckets, candidates restricted to
  equal buckets (equi-join), exact cosine re-ranking inside. The
  100 TB path: bucket join instead of probes×corpus blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dataflowex_spark.functions.vectors import cosine_similarity, dot, l2_norm

DRIVER_ROWS_BOUND = 200_000
"""Corpus-row gate for the driver k-center / PQ-audit replays —
a property of the DATA (measured row count), never of core count;
tests lower it to force the distributed branch (branch parity)."""


def knn_cosine_exact(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe.

    Returns (probe_id, vec_id, sim, rank). Ties broken by id for
    determinism. Plan shape: broadcast(probes) nested-loop against the
    corpus scan (no corpus shuffle), then one shuffle keyed by
    probe_id for the top-k window — both AQE-friendly.
    """
    p = probes.select(
        F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__probe_vec")
    )
    sim = cosine_similarity(F.col(vec_col), F.col("__probe_vec")).alias("sim")
    scored = (
        corpus.join(F.broadcast(p), F.col(id_col) != F.col(probe_id_col))
        .select(probe_id_col, id_col, sim)
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python LCG —
    no numpy dependency at plan-build time, reproducible everywhere)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            # xorshift64*
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 10_000_019) / 10_000_019.0) * 2.0 - 1.0)
        planes.append(row)
    return planes


def knn_cosine_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    dim: int | None = None,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` sign bits
    each; a corpus row is a candidate for a probe if they share the
    full sign pattern in ANY table. Candidates equi-join on
    (table, bucket) — shuffle keyed by bucket, never all-pairs —
    then exact cosine + per-probe top-k re-rank. Recall tunes with
    n_tables/n_planes.

    The hyperplanes travel as a BROADCAST DataFrame of
    (table, array<array<double>>) rows, NOT as n_tables×n_planes×dim
    literals baked into the expression tree — a realistic
    768-dim/16-plane/8-table config is ~100k literals, the same
    Catalyst plan-explosion class the IVF centroids avoid the same
    way. Plan size is therefore independent of dim/n_planes; the
    sign bits fold JVM-side via ``transform``+``aggregate``.

    ``dim`` defaults to the probe embeddings' length. A wrong ``dim``
    would NULL-pad every dot product and collapse all vectors into one
    bucket (a silent cross-join), so mismatching rows are rejected at
    plan time via a sampled check.
    """
    if dim is None:
        row = probes.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            raise ValueError("knn_cosine_lsh: empty probe set")
        dim = row["d"]
    # sampled guard (not a full scan): any embedding whose length
    # differs from `dim` would hash into a degenerate all-zero bucket
    for side, name in ((probes, "probes"), (corpus, "corpus")):
        bad = (
            side.select(F.size(F.col(vec_col)).alias("d"))
            .limit(1000)
            .filter(F.col("d") != dim)
            .first()
        )
        if bad is not None:
            raise ValueError(
                f"knn_cosine_lsh: {name} embedding length {bad['d']} != dim {dim}"
            )

    from dataflowex_spark.plans import local_rows_df

    spark = corpus.sparkSession
    planes_df = local_rows_df(
        spark,
        [
            (t, [[float(x) for x in p] for p in _hyperplanes(dim, n_planes, seed + 1000 * t)])
            for t in range(n_tables)
        ],
        "table int, __planes array<array<double>>",
    )

    def bucketize(df: DataFrame, out_id: str) -> DataFrame:
        # one sign bit per plane, folded into a long bucket id:
        # acc*2 + bit (left fold over the plane array). Encoding only
        # has to agree between the two sides — both use this fold.
        bucket = F.aggregate(
            F.transform(
                F.col("__planes"),
                lambda p: F.when(dot(F.col(vec_col), p) >= 0, 1)
                .otherwise(0)
                .cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, bit: acc * 2 + bit,
        )
        return df.crossJoin(F.broadcast(planes_df)).select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(f"__vec_{out_id}"),
            F.col("table"),
            bucket.alias("bucket"),
        )

    c = bucketize(corpus, "cand_id")
    p = bucketize(probes, probe_id_col)
    cand = (
        p.join(c, on=["table", "bucket"])
        .filter(F.col("cand_id") != F.col(probe_id_col))
        .select(
            probe_id_col,
            F.col("cand_id").alias(id_col),
            F.col(f"__vec_{probe_id_col}").alias("__pv"),
            F.col("__vec_cand_id").alias("__cv"),
        )
        .distinct()
    )
    scored = cand.select(
        probe_id_col,
        id_col,
        cosine_similarity(F.col("__cv"), F.col("__pv")).alias("sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_cosine_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    n_cells: int = 16,
    n_probe_cells: int = 3,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN: k-means the corpus into
    ``n_cells`` Voronoi cells, search only each probe's
    ``n_probe_cells`` nearest cells.

    Scale shape: centroids are tiny (n_cells × dim) and broadcast
    everywhere; the corpus partitions by cell id once (a single keyed
    shuffle at index-build time, reusable across queries); per probe
    the candidate set shrinks by ~n_cells/n_probe_cells. Training
    samples the corpus — KMeans never sees all 100 TB.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.withColumn("__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__v",
        predictionCol="__cell",
    )
    model = km.fit(corpus_v.select("__v"))
    assigned = model.transform(corpus_v).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__cell"),
    )

    # per probe: rank cells by centroid cosine, keep n_probe_cells.
    # Centroids travel as a broadcast DataFrame — NOT as n_cells×dim
    # literals baked into one expression (4096×768 literals would blow
    # up the Catalyst plan); the probe×centroid frame is
    # |probes|·n_cells rows of plain column math, fully distributed.
    from dataflowex_spark.plans import local_rows_df

    spark = corpus.sparkSession
    cent_df = local_rows_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cell int, __centroid array<double>",
    )
    w_cell = Window.partitionBy(probe_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    p = (
        probes.select(
            F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pv")
        )
        .crossJoin(F.broadcast(cent_df))
        .withColumn(
            "__csim", cosine_similarity(F.col("__pv"), F.col("__centroid"))
        )
        .withColumn("__cr", F.row_number().over(w_cell))
        .filter(F.col("__cr") <= n_probe_cells)
        .select(probe_id_col, "__pv", "__cell")
    )

    cand = (
        p.join(assigned, on="__cell")
        .filter(F.col("cand_id") != F.col(probe_id_col))
        .select(
            probe_id_col,
            F.col("cand_id").alias(id_col),
            cosine_similarity(F.col("__cv"), F.col("__pv")).alias("sim"),
        )
    )
    w = Window.partitionBy(probe_id_col).orderBy(F.col("sim").desc(), F.col(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_build_index(
    corpus: DataFrame,
    index_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 8,
    train_fraction: float | None = None,
) -> None:
    """Build and PERSIST an IVF index: k-means centroids + cell-keyed
    corpus assignments, written once and reused across query batches —
    :func:`knn_cosine_ivf` rebuilds the k-means on every call, which
    is wrong for a production pipeline that answers many probe batches
    against one slowly-changing corpus.

    Layout under ``index_path``:
    - ``centroids/``    (__cell int, __centroid array<double>) — tiny,
      broadcast at query time;
    - ``assignments/``  (id, embedding, __cell) written
      ``partitionBy(__cell)`` so a probe batch that visits
      ``n_probe_cells`` cells PRUNES every other cell's files at the
      scan (directory-level partition pruning — the inverted file).

    ``train_fraction`` samples the corpus for k-means training
    (KMeans never needs all 100 TB to place centroids); assignment
    still covers every row.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.withColumn(
        "__v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    train = corpus_v.select("__v")
    if train_fraction is not None:
        train = train.sample(fraction=train_fraction, seed=seed)
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__v",
        predictionCol="__cell",
    ).fit(train)

    from dataflowex_spark.plans import local_rows_df

    spark = corpus.sparkSession
    # single-slice local frame: a coalesce(1) over the default
    # 32-slice parallelized list drains one Python worker round-trip
    # PER SLICE sequentially (~6 s for 8 rows on local[32]); one
    # slice writes the identical file in one task
    local_rows_df(
        spark,
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        "__cell int, __centroid array<double>",
    ).write.mode("overwrite").parquet(
        index_path.rstrip("/") + "/centroids"
    )
    (
        model.transform(corpus_v)
        .select(id_col, vec_col, "__cell")
        .repartition("__cell")  # one task per cell: no small-files spray
        .write.mode("overwrite")
        .partitionBy("__cell")
        .parquet(index_path.rstrip("/") + "/assignments")
    )


def ivf_search(
    probes: DataFrame,
    index_path: str,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    n_probe_cells: int = 3,
    with_cost: bool = False,
) -> DataFrame:
    """Query a persisted IVF index (see :func:`ivf_build_index`):
    rank cells per probe by centroid cosine, read ONLY the chosen
    cells' assignment partitions (cell-id filter → directory pruning),
    exact-cosine re-rank inside. Same output contract as the other
    kNN variants: (probe_id, vec_id, sim, rank).

    The index is built once; this function is safe to call per probe
    batch — no k-means, no corpus shuffle, the only joins are
    probe×centroid (broadcast) and the cell equi-join.
    """
    spark = probes.sparkSession
    cent_df = spark.read.parquet(index_path.rstrip("/") + "/centroids")
    w_cell = Window.partitionBy(probe_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    p = (
        probes.select(
            F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pv")
        )
        .crossJoin(F.broadcast(cent_df))
        .withColumn(
            "__csim", cosine_similarity(F.col("__pv"), F.col("__centroid"))
        )
        .withColumn("__cr", F.row_number().over(w_cell))
        .filter(F.col("__cr") <= n_probe_cells)
        .select(probe_id_col, "__pv", "__cell")
    )
    # deliberate driver-side collect: the list is bounded by n_cells
    # (an index PARAMETER, typically ≤ 4096 — never data-sized), and
    # literal cell ids are what lets the isin() prune assignment
    # DIRECTORIES at planning time instead of relying on runtime DPP
    cells = [r["__cell"] for r in p.select("__cell").distinct().collect()]
    assigned = (
        spark.read.parquet(index_path.rstrip("/") + "/assignments")
        .filter(F.col("__cell").isin(cells))  # partition-pruned scan
        .select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("__cv"),
            "__cell",
        )
    )
    cand = (
        p.join(assigned, on="__cell")
        .filter(F.col("cand_id") != F.col(probe_id_col))
        .select(
            probe_id_col,
            F.col("cand_id").alias(id_col),
            cosine_similarity(F.col("__cv"), F.col("__pv")).alias("sim"),
        )
    )
    if with_cost:
        # candidates scored per probe — the cost a larger n_probe
        # pays for its recall; one count over the same window key
        cand = cand.withColumn(
            "n_candidates",
            F.count("*").over(Window.partitionBy(probe_id_col)),
        )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_recall_audit(
    probes: DataFrame,
    index_path: str,
    n_probe_list: list[int],
    exact: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Recall/cost curve for a persisted IVF index: for each
    ``n_probe`` setting, run :func:`ivf_search` and measure, against
    a precomputed ``exact`` top-k frame (:func:`knn_cosine_exact`
    output), the fraction of true neighbors recovered plus the
    candidate volume paid — the audit every ANN deployment needs
    before picking its speed/recall point (Johnson et al., the
    faiss IVF tuning loop, done as DataFrame plans).

    Returns one row per setting:
    ``(n_probe, recall_at_k, avg_candidates, n_probes)`` where
    recall@k = |approx ∩ exact| / |exact| averaged over probes and
    ``avg_candidates`` is the mean per-probe candidate count scored
    (the cost proxy — it scales with cells visited, and is the term
    a bigger ``n_probe`` buys recall with).

    Scale shape: ``exact`` is computed ONCE and reused across all
    settings (it is the expensive half); the CANDIDATE frame is also
    scored once, at max(n_probe) — a smaller setting's candidate set
    is exactly the rows whose cell rank fits its budget, so every
    audited setting filters the one shared frame instead of paying
    its own index search (4 scans+collects → 1). Everything joins on
    (probe, neighbor) keys — no collects beyond the cell list and the
    final len(n_probe_list)-row frame."""
    # materialize the exact answer ONCE: it joins into every audited
    # setting, and without the checkpoint each setting's execution
    # would re-run the O(probes x corpus) brute-force scan (plus a
    # second time for the totals) — the opposite of the
    # "computed once, reused" cost story this audit exists to give
    ex = (
        exact.filter(F.col("rank") <= k)
        .select(probe_id_col, F.col(id_col).alias("__true"))
        .localCheckpoint(eager=True)
    )
    n_exact = ex.groupBy(probe_id_col).agg(
        F.count("*").alias("__n_true")
    )
    # one search at the LARGEST setting, keeping each candidate's
    # cell rank: filtering __cr <= np reproduces that setting's
    # ivf_search candidates (same cells, same cosine scores) without
    # re-reading the index per setting
    spark = probes.sparkSession
    max_np = max(n_probe_list)
    cent_df = spark.read.parquet(index_path.rstrip("/") + "/centroids")
    w_cell = Window.partitionBy(probe_id_col).orderBy(
        F.col("__csim").desc(), F.col("__cell")
    )
    p = (
        probes.select(
            F.col(id_col).alias(probe_id_col), F.col(vec_col).alias("__pv")
        )
        .crossJoin(F.broadcast(cent_df))
        .withColumn(
            "__csim", cosine_similarity(F.col("__pv"), F.col("__centroid"))
        )
        .withColumn("__cr", F.row_number().over(w_cell))
        .filter(F.col("__cr") <= max_np)
        .select(probe_id_col, "__pv", "__cell", "__cr")
    )
    cells = [r["__cell"] for r in p.select("__cell").distinct().collect()]
    assigned = (
        spark.read.parquet(index_path.rstrip("/") + "/assignments")
        .filter(F.col("__cell").isin(cells))  # partition-pruned scan
        .select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("__cv"),
            "__cell",
        )
    )
    cand_all = (
        p.join(assigned, on="__cell")
        .filter(F.col("cand_id") != F.col(probe_id_col))
        .select(
            probe_id_col,
            F.col("cand_id").alias(id_col),
            "__cr",
            cosine_similarity(F.col("__cv"), F.col("__pv")).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    w_rank = Window.partitionBy(probe_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    out = None
    for np_ in n_probe_list:
        sub = cand_all.filter(F.col("__cr") <= np_).withColumn(
            "n_candidates",
            F.count("*").over(Window.partitionBy(probe_id_col)),
        )
        got = sub.withColumn("rank", F.row_number().over(w_rank)).filter(
            F.col("rank") <= k
        )
        hits = (
            got.select(
                probe_id_col,
                F.col(id_col).alias("__true"),
                "n_candidates",
            )
            .groupBy(probe_id_col)
            .agg(
                F.first("n_candidates").alias("__n_cand"),
            )
            .join(
                got.select(probe_id_col, F.col(id_col).alias("__true"))
                .join(ex, [probe_id_col, "__true"])
                .groupBy(probe_id_col)
                .agg(F.count("*").alias("__n_hit")),
                probe_id_col,
                "left",
            )
        )
        per_probe = n_exact.join(hits, probe_id_col, "left").select(
            (
                F.coalesce(F.col("__n_hit"), F.lit(0))
                / F.col("__n_true").cast("double")
            ).alias("__recall"),
            F.coalesce(F.col("__n_cand"), F.lit(0)).alias("__n_cand"),
        )
        row = per_probe.agg(
            F.lit(np_).alias("n_probe"),
            F.round(F.avg("__recall"), 4).alias("recall_at_k"),
            F.round(F.avg("__n_cand"), 1).alias("avg_candidates"),
            F.count("*").cast("long").alias("n_probes"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_probe")


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means the embedding
    space into ``n_cells`` clusters, enumerate cosine pairs ONLY
    inside each cluster, and drop every item whose similarity to a
    LOWER-id item in its cluster reaches ``threshold`` (min-id
    canonical — same deterministic survivor rule as
    ``dedup_exact``/``canonical election``).

    Returns (id, keep, dup_of): ``dup_of`` is the lowest-id similar
    neighbor for dropped rows, NULL for survivors.

    Scale shape (the SemDeDup argument): the quadratic pair
    enumeration is BOUNDED per cluster — with balanced k-means,
    pairs ≈ n²/n_cells, and n_cells grows with corpus size so
    per-cluster population stays ~constant; the cluster id is an
    equi-join key, so candidates co-locate in one shuffle. Cross-
    cluster near-dups are the documented recall trade (SemDeDup
    accepts it; raise n_probe-style multi-assignment if needed).
    KMeans fits on the corpus sample — never all of 100 TB."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = corpus.withColumn(
        "__v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__v",
        predictionCol="__cell",
    )
    model = km.fit(corpus_v.select("__v"))
    assigned = model.transform(corpus_v).select(
        F.col(id_col), F.col(vec_col).alias("__e"), "__cell"
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("__e").alias("__ea"), "__cell"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("__e").alias("__eb"), "__cell"
    )
    dup = (
        a.join(b, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__sim", cosine_similarity(F.col("__ea"), F.col("__eb")))
        .filter(F.col("__sim") >= threshold)
        .groupBy(F.col("id_b").alias(id_col))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        corpus.select(id_col)
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """K-minimum-values sketch of a key set: the k smallest PORTABLE
    md5 hashes of the distinct keys, as a one-column frame ``h``.

    The hash is the repo-wide cross-engine md5 bucket (first 15 hex
    digits → bigint, identical in Spark / DuckDB / Python), so a
    sketch built here is bit-reproducible by the oracle — auditable
    sketching, which xxhash64 can't give. The global top-k runs as
    TakeOrderedAndProject (per-partition heads + driver merge of k
    rows), NOT a global sort."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return df.select(h.alias("h")).distinct().orderBy("h").limit(k)


def kmv_jaccard(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    k: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """KMV Jaccard estimate between two key sets, next to the exact
    value: 1 row ``(est_jaccard, jaccard, n_a, n_b, k)``.

    Estimator (Beyer et al., "On Synopses for Distinct-Value
    Estimation Under Multiset Operations", SIGMOD'07): build the
    k-min sketch of each set, take the k smallest of their union,
    and count how many of those lie in BOTH input sketches — that
    count over the UNION SKETCH SIZE (min(k, |A∪B|) rows — dividing
    by fixed k biases the estimate low whenever the union is smaller
    than k) estimates |A∩B| / |A∪B|. Everything after the two
    distinct() passes operates on ≤2k rows; the exact Jaccard
    (for the audit column) is two more hash aggregations."""
    sa = kmv_sketch(df_a, key_col, k).localCheckpoint(eager=False)
    sb = kmv_sketch(df_b, key_col, k).localCheckpoint(eager=False)
    union_k = (
        sa.unionByName(sb).distinct().orderBy("h").limit(k)
    )
    marked = union_k.join(
        F.broadcast(sa.withColumn("__a", F.lit(1))), "h", "left"
    ).join(F.broadcast(sb.withColumn("__b", F.lit(1))), "h", "left")
    est = marked.agg(
        (
            F.sum(
                (
                    F.col("__a").isNotNull() & F.col("__b").isNotNull()
                ).cast("long")
            )
            / F.count("*")
        ).alias("__est")
    )
    a_keys = df_a.select(F.col(key_col).alias("__k")).distinct()
    b_keys = df_b.select(F.col(key_col).alias("__k")).distinct()
    inter = a_keys.join(b_keys, "__k", "left_semi").agg(
        F.count("*").alias("__inter")
    )
    n_a = a_keys.agg(F.count("*").alias("__na"))
    n_b = b_keys.agg(F.count("*").alias("__nb"))
    return (
        est.crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(n_a))
        .crossJoin(F.broadcast(n_b))
        .select(
            F.round("__est", round_digits).alias("est_jaccard"),
            F.round(
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast(
                    "double"
                ),
                round_digits,
            ).alias("jaccard"),
            F.col("__na").alias("n_a"),
            F.col("__nb").alias("n_b"),
            F.lit(k).alias("k"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    anchor_id_col: str = "anchor_id",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most-similar vectors with a DIFFERENT label — the negatives
    that actually teach the model something (random negatives are
    trivially separable; the confusing ones sit near the boundary).

    Returns (anchor_id, vec_id, sim, rank), ties broken by id. Plan
    shape mirrors :func:`knn_cosine_exact`: broadcast(anchors)
    nested-loop against the corpus scan with the label-mismatch
    predicate fused into the join condition (filters candidates
    BEFORE scoring work), then one shuffle keyed on anchor for the
    top-k window. At 100 TB, swap the NLJ for the IVF/LSH candidate
    generators and keep the same label predicate on the candidate
    join — the mining semantics don't change."""
    a = anchors.select(
        F.col(id_col).alias(anchor_id_col),
        F.col(vec_col).alias("__avec"),
        F.col(label_col).alias("__albl"),
    )
    sim = cosine_similarity(F.col(vec_col), F.col("__avec")).alias("sim")
    scored = corpus.join(
        F.broadcast(a),
        (F.col(id_col) != F.col(anchor_id_col))
        & (F.col(label_col) != F.col("__albl")),
    ).select(anchor_id_col, id_col, sim)
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR'09): fuse the
    ranked lists of several retrieval systems into one hybrid ranking

        rrf(d) = Σ_systems 1/(k + rank_s(d))      (k = 60 canonical)

    — the standard way to combine lexical (BM25) and vector (ANN)
    retrieval without score calibration, since only RANKS enter.

    ``rankings`` maps system name → DataFrame with (id_col, rank_col);
    each input is expected to be an already-truncated top-N list
    (bounded — a retrieval output, not a corpus), so the fusion is a
    full outer join over ≤ Σ N rows: driver-light, shuffle-trivial,
    and independent of corpus size. A document missing from a system's
    list contributes 0 for that system (the per-system rank columns
    stay NULL so callers can see provenance).

    Returns (id_col, rrf, <name>_rank ...) — one rank column per
    system, fused score unrounded (callers round for presentation).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = None
    for name, df in rankings.items():
        part = df.select(
            F.col(id_col), F.col(rank_col).alias(f"{name}_rank")
        )
        fused = part if fused is None else fused.join(
            part, id_col, "full_outer"
        )
    rank_cols = [f"{name}_rank" for name in rankings]
    score = sum(
        (
            F.when(
                F.col(c).isNotNull(), F.lit(1.0) / (F.lit(k) + F.col(c))
            ).otherwise(F.lit(0.0))
            for c in rank_cols
        ),
        F.lit(0.0),
    )
    return fused.select(id_col, score.alias("rrf"), *rank_cols)


def mmr_select(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily select ``k`` results trading off relevance
    against redundancy with what is already selected,

        step 1:   argmax rel(d)
        step i>1: argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)

    ``candidates`` is an already-truncated top-N retrieval list
    (id, rel, embedding) — BOUNDED by construction, which is the
    scale contract: the distributed work is candidate GENERATION
    (kNN/LSH/IVF upstream); MMR is inherently sequential-greedy, so
    it runs as k driver-bounded argmax rounds over this broadcast-
    sized frame (pairwise sims among ≤N rows, one 1-row collect per
    round — never corpus-scale). Ties break by id; sims and scores
    round to 6 decimals IN the plan so the greedy path is engine-
    deterministic. Returns (step, id_col, mmr) for the k picks.
    """
    from dataflowex_spark.functions.vectors import cosine_similarity

    spark = candidates.sparkSession
    cand = candidates.select(id_col, rel_col, vec_col).localCheckpoint()
    rhs = cand.select(
        F.col(id_col).alias("__id_b"), F.col(vec_col).alias("__vb")
    )
    pairs = (
        cand.crossJoin(F.broadcast(rhs))
        .filter(F.col(id_col) != F.col("__id_b"))
        .select(
            id_col,
            "__id_b",
            F.round(
                cosine_similarity(F.col(vec_col), F.col("__vb")), 6
            ).alias("__s"),
        )
        .localCheckpoint()
    )
    selected: list = []
    out: list[tuple] = []
    for step in range(1, k + 1):
        if not selected:
            pick = (
                cand.select(
                    id_col, F.round(F.col(rel_col), 6).alias("__mmr")
                )
                .orderBy(F.col("__mmr").desc(), id_col)
                .first()
            )
        else:
            mx = (
                pairs.filter(F.col("__id_b").isin(selected))
                .groupBy(id_col)
                .agg(F.max("__s").alias("__mx"))
            )
            pick = (
                cand.filter(~F.col(id_col).isin(selected))
                .join(mx, id_col)
                .select(
                    id_col,
                    F.round(
                        F.lit(lam) * F.col(rel_col)
                        - F.lit(1.0 - lam) * F.col("__mx"),
                        6,
                    ).alias("__mmr"),
                )
                .orderBy(F.col("__mmr").desc(), id_col)
                .first()
            )
        selected.append(pick[id_col])
        out.append((step, pick[id_col], pick["__mmr"]))
    return spark.createDataFrame(
        out, f"step int, {id_col} long, mmr double"
    )


def _sq_l2_q(a, b, scale: int = 1_000_000_000):
    """Squared L2 distance quantized to an integer (``floor(d²·1e9)``)
    — exact long arithmetic downstream (sums/argmins are
    order-independent), the repo's standard defense against
    float-reduction nondeterminism."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(d2 * scale).cast("long")


def pq_train(
    corpus: DataFrame,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
):
    """PRODUCT QUANTIZATION codebook training + encoding (Jégou et
    al., "Product quantization for nearest neighbor search", IEEE
    TPAMI 2011): the vector splits into ``m_sub`` subvectors; each
    subspace gets its own ``n_codes``-centroid k-means codebook; a
    vector's code is its m_sub nearest-centroid ids — dim×4 bytes
    compress to m_sub×log2(n_codes) bits (64-dim float32 → 8 bytes
    here, 32×).

    Distributed Lloyd iterations with the determinism discipline the
    registry's correctness gate needs: centroid recomputation sums
    QUANTIZED coordinates (exact longs, order-independent),
    assignment argmins compare quantized distances with code-id
    tie-break, and initialization is the n_codes lowest-id vectors
    per subspace — bit-stable across runs and partitionings. Each
    iteration is one broadcast join (codebook is m_sub×n_codes×d_sub
    floats — KBs) + one bounded agg collect (m_sub·n_codes·d_sub
    rows). The corpus never shuffles; at 100 TB you'd train on a
    sample (like ivf_build_index) and encode the full set with the
    final broadcast codebook — encoding is scan-local.

    Returns ``(cent_df, codes_df)``: the codebook (s, code, cent) and
    the encoded corpus (id_col, s, code)."""
    spark = corpus.sparkSession
    ds = dim // m_sub
    vec = F.col(vec_col).cast("array<double>")
    sub = corpus.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(vec, s * ds + 1, ds).alias("sv"),
                    )
                    for s in range(m_sub)
                ]
            )
        ).alias("u"),
    ).select(id_col, F.col("u.s").alias("s"), F.col("u.sv").alias("sv"))
    sub = sub.persist()

    init = (
        corpus.select(id_col, vec.alias("__v"))
        .orderBy(id_col)
        .limit(n_codes)
        .collect()
    )
    cents = {
        (s, c): [float(x) for x in r["__v"][s * ds : (s + 1) * ds]]
        for c, r in enumerate(init)
        for s in range(m_sub)
    }

    def cent_frame():
        from dataflowex_spark.plans import local_rows_df

        return local_rows_df(
            spark,
            [(s, c, v) for (s, c), v in sorted(cents.items())],
            "s int, code int, cent array<double>",
        )

    assigned = None
    for _ in range(iters):
        cent_df = cent_frame()
        assigned = (
            sub.join(F.broadcast(cent_df), "s")
            .withColumn("dq", _sq_l2_q(F.col("sv"), F.col("cent")))
            .groupBy(id_col, "s")
            .agg(F.min(F.struct("dq", "code", "sv")).alias("m"))
            .select(
                id_col,
                "s",
                F.col("m.code").alias("code"),
                F.col("m.sv").alias("sv"),
            )
        )
        # exact integer coordinate sums -> deterministic new means
        rows = (
            assigned.select(
                "s", "code", F.posexplode("sv").alias("d", "val")
            )
            .groupBy("s", "code", "d")
            .agg(
                F.sum(F.floor(F.col("val") * 1_000_000).cast("long")).alias(
                    "sq"
                ),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = {}
        for r in rows:
            new.setdefault((r["s"], r["code"]), [0.0] * ds)[r["d"]] = (
                r["sq"] / r["n"] / 1_000_000.0
            )
        # empty clusters keep their previous centroid
        cents.update(new)

    codes = assigned.select(id_col, "s", "code")
    return cent_frame(), codes


def pq_adc_search(
    cent_df: DataFrame,
    codes: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m_sub: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per probe, a
    LOOKUP TABLE of (subspace, code) → quantized partial distance is
    computed against the broadcast codebook (|probes|·m_sub·n_codes
    rows — tiny), then joined to the corpus CODES (never the raw
    vectors) and summed per (probe, candidate). The corpus side
    touches 8-byte codes instead of 256-byte vectors — the 32×
    memory-bandwidth win that makes billion-scale ANN fit in RAM; at
    100 TB this composes with IVF (q161's index) to also cut the
    candidate COUNT, ADC cutting the candidate WIDTH."""
    ds = dim // m_sub
    vec = F.col(vec_col).cast("array<double>")
    psub = probes.select(
        F.col(id_col).alias(probe_id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(vec, s * ds + 1, ds).alias("pv"),
                    )
                    for s in range(m_sub)
                ]
            )
        ).alias("u"),
    ).select(
        probe_id_col, F.col("u.s").alias("s"), F.col("u.pv").alias("pv")
    )
    lut = (
        psub.join(F.broadcast(cent_df), "s")
        .withColumn("pd", _sq_l2_q(F.col("pv"), F.col("cent")))
        .select(probe_id_col, "s", "code", "pd")
    )
    approx = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .groupBy(probe_id_col, id_col)
        .agg(F.sum("pd").alias("adist"))
        .where(F.col(probe_id_col) != F.col(id_col))
    )
    w = Window.partitionBy(probe_id_col).orderBy("adist", id_col)
    return (
        approx.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(probe_id_col, id_col, "adist", "rank")
    )


def pq_recall_audit(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """recall@k of PQ-ADC against exact squared-L2 top-k, per probe —
    the accuracy/compression audit q298 gives IVF, for the PQ tier.
    Exact side is brute force over the fixture (the baseline PQ
    approximates); both rankings quantize distances and tie-break on
    candidate id, so the audit is bit-stable.

    Bounded corpora run the whole audit on the driver with numpy
    (the house bounded-state pattern — pagerank rounds, BPE merges,
    k-center): the audit's Lloyd iterations are collect-barriered
    Spark jobs whose data is a broadcast-sized frame, so the
    distributed loop pays ~20 s of per-job overhead to move KBs. The
    numpy path replays the SAME quantized-integer arithmetic in the
    SAME fold order (left-fold float64 sums, floor·1e9 distances,
    floor·1e6 coordinate sums, (dq, code)/(dist, id) tie-breaks), so
    outputs are bit-identical — pinned by
    tests/test_dedup_similarity.py::test_pq_audit_driver_matches_distributed.
    Above the bound the distributed path runs unchanged (corpus never
    collects; training samples at 100 TB)."""
    if corpus.count() <= DRIVER_ROWS_BOUND:
        return _pq_recall_audit_driver(
            corpus, probes, k, m_sub, n_codes, iters, vec_col, id_col,
            dim,
        )
    return _pq_recall_audit_dist(
        corpus, probes, k, m_sub, n_codes, iters, vec_col, id_col, dim
    )


def _pq_recall_audit_dist(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    m_sub: int,
    n_codes: int,
    iters: int,
    vec_col: str,
    id_col: str,
    dim: int,
) -> DataFrame:
    pq_cent, pq_codes = pq_train(
        corpus, m_sub, n_codes, iters, vec_col, id_col, dim
    )
    got = pq_adc_search(
        pq_cent, pq_codes, probes, k, m_sub, vec_col, id_col, "probe_id",
        dim,
    )
    vec = F.col(vec_col).cast("array<double>")
    pv = probes.select(
        F.col(id_col).alias("probe_id"), vec.alias("__pv")
    )
    cv = corpus.select(F.col(id_col), vec.alias("__cv"))
    exact = (
        pv.crossJoin(cv)
        .where(F.col("probe_id") != F.col(id_col))
        .withColumn("dq", _sq_l2_q(F.col("__pv"), F.col("__cv")))
    )
    w = Window.partitionBy("probe_id").orderBy("dq", id_col)
    exact_topk = (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", id_col)
    )
    overlap = got.join(exact_topk, ["probe_id", id_col]).groupBy(
        "probe_id"
    ).agg(F.count("*").alias("n_overlap"))
    return (
        pv.select("probe_id")
        .join(overlap, "probe_id", "left")
        .select(
            "probe_id",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0))
                * 1_000_000
                / F.lit(k)
            )
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("probe_id")
    )


def _pq_recall_audit_driver(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    m_sub: int,
    n_codes: int,
    iters: int,
    vec_col: str,
    id_col: str,
    dim: int,
) -> DataFrame:
    """numpy replay of the distributed audit — every quantization,
    fold order and tie-break mirrored so results are bit-identical
    (see pq_recall_audit docstring). Two bounded collects (corpus +
    probes), zero Spark jobs in the math."""
    import numpy as np

    spark = corpus.sparkSession
    ds = dim // m_sub
    vec = F.col(vec_col).cast("array<double>")
    rows = sorted(
        corpus.select(F.col(id_col).alias("__id"), vec.alias("__v")).collect(),
        key=lambda r: r["__id"],
    )
    ids = np.array([r["__id"] for r in rows], dtype=np.int64)
    X = np.array([r["__v"] for r in rows], dtype=np.float64)
    n = len(rows)

    def d2_cols(M, cent):
        # left-fold sum of squared diffs, dim by dim — the exact
        # float64 add order of aggregate(zip_with(...), 0.0, acc+v)
        acc = np.zeros(len(M), dtype=np.float64)
        for d in range(len(cent)):
            acc = acc + (M[:, d] - cent[d]) ** 2
        return acc

    # ---- pq_train replay ----
    # init: the n_codes lowest-id vectors, one centroid per subspace
    cents: dict[tuple[int, int], list[float]] = {
        (s, c): [float(x) for x in X[c, s * ds : (s + 1) * ds]]
        for c in range(min(n_codes, n))
        for s in range(m_sub)
    }
    codes_m = np.zeros((n, m_sub), dtype=np.int64)
    for _ in range(iters):
        # assignment under the current codebook: argmin of quantized
        # distance, first-min == lowest code (codes scanned ascending)
        for s in range(m_sub):
            Xs = X[:, s * ds : (s + 1) * ds]
            cl = sorted(c for (ss, c) in cents if ss == s)
            Dq = np.empty((n, len(cl)), dtype=np.int64)
            for j, c in enumerate(cl):
                Dq[:, j] = np.floor(
                    d2_cols(Xs, cents[(s, c)]) * 1_000_000_000
                ).astype(np.int64)
            codes_m[:, s] = np.asarray(cl, dtype=np.int64)[
                np.argmin(Dq, axis=1)
            ]
        # new centroids: exact integer coordinate sums; empty
        # clusters keep their previous centroid
        for s in range(m_sub):
            Q = np.floor(X[:, s * ds : (s + 1) * ds] * 1_000_000).astype(
                np.int64
            )
            for c in np.unique(codes_m[:, s]):
                mask = codes_m[:, s] == c
                sq = Q[mask].sum(axis=0)
                nn = int(mask.sum())
                cents[(s, int(c))] = [
                    int(sq[d]) / nn / 1_000_000.0 for d in range(ds)
                ]
    # codes = the LAST assignment (pre-final-update codebook);
    # cents = post-final-update — exactly the distributed pairing

    probe_rows = sorted(
        probes.select(F.col(id_col).alias("__id"), vec.alias("__v")).collect(),
        key=lambda r: r["__id"],
    )
    pids = np.array([r["__id"] for r in probe_rows], dtype=np.int64)
    PV = np.array([r["__v"] for r in probe_rows], dtype=np.float64)
    np_probes = len(probe_rows)

    def topk_ids(dist_row, self_id):
        # rank by (dist, id) ascending, skip the probe itself; ids
        # are sorted ascending so a stable sort IS the id tie-break
        order = np.argsort(dist_row, kind="stable")
        out = []
        for j in order:
            if ids[j] == self_id:
                continue
            out.append(ids[j])
            if len(out) == k:
                break
        return set(out)

    # ---- pq_adc_search replay: probe LUT + code-sum distances ----
    lut = np.zeros((np_probes, m_sub, n_codes), dtype=np.int64)
    for s in range(m_sub):
        Ps = PV[:, s * ds : (s + 1) * ds]
        for c in sorted(c for (ss, c) in cents if ss == s):
            lut[:, s, c] = np.floor(
                d2_cols(Ps, cents[(s, c)]) * 1_000_000_000
            ).astype(np.int64)
    adist = np.zeros((np_probes, n), dtype=np.int64)
    for s in range(m_sub):
        adist += lut[:, s, codes_m[:, s]]

    # ---- exact squared-L2 replay ----
    acc = np.zeros((np_probes, n), dtype=np.float64)
    for d in range(dim):
        acc = acc + (PV[:, d][:, None] - X[:, d][None, :]) ** 2
    dq = np.floor(acc * 1_000_000_000).astype(np.int64)

    out = []
    for p in range(np_probes):
        got = topk_ids(adist[p], pids[p])
        true = topk_ids(dq[p], pids[p])
        n_overlap = len(got & true)
        out.append(
            (
                int(pids[p]),
                n_overlap,
                int(n_overlap * 1_000_000 / k),
            )
        )
    from dataflowex_spark.plans import local_rows_df

    return local_rows_df(
        spark, out, "probe_id long, n_overlap long, recall_ppm long"
    ).orderBy("probe_id")


def kcenter_select(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Greedy k-center (Gonzalez farthest-point) DIVERSITY selection —
    the coreset sampler embedding-curation pipelines use to pick a
    maximally-spread subset (2-approximation to the k-center optimum,
    the classic guarantee). Deterministic: seeded at the minimum id,
    each round picks the point maximizing distance-to-nearest-center
    with ties broken by id.

    Scale shape: k−1 rounds, each ONE scan-local min-distance
    projection against the BROADCAST center list plus a TakeOrdered
    top-1 (per-partition heaps) — the corpus never shuffles and
    driver state is k rows. k is small by the method's nature
    (diversity anchors, not clustering). Returns the selected rows as
    a list of (id, vector)."""
    from pyspark.sql import functions as F

    pts = df.select(id_col, vec_col)
    n = pts.count()
    if n <= DRIVER_ROWS_BOUND:
        # Bounded corpus: run the greedy loop on the driver over the
        # collected (id, vector) rows — the k−1 scan+argmax Spark
        # rounds (interpreted HOF distance lambdas, one job each)
        # cost orders of magnitude more than the vectorized numpy
        # argmax for anything that fits in a broadcast-sized frame.
        # Same seed (min id), same tie-break (first max at the
        # smallest id after the sort).
        import numpy as np

        rows = sorted(pts.collect(), key=lambda r: r[id_col])
        ids = [r[id_col] for r in rows]
        X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
        i0 = 0  # rows sorted by id → min id first
        centers = [(ids[i0], [float(v) for v in X[i0]])]
        mind = ((X - X[i0]) ** 2).sum(axis=1)
        for _ in range(k - 1):
            j = int(np.argmax(mind))  # first max → smallest id
            centers.append((ids[j], [float(v) for v in X[j]]))
            mind = np.minimum(mind, ((X - X[j]) ** 2).sum(axis=1))
        return centers
    # Distributed branch: Gonzalez with INCREMENTAL min-distance —
    # each round measures distance to the NEWEST center only and
    # folds it into the carried minimum (min is associative, so the
    # values are bit-identical to recomputing every center), turning
    # the former O(k²·n) re-scan of the whole center list per round
    # into O(k·n). State is checkpointed per round so the distance
    # expression tree stays one center deep.
    first = pts.orderBy(id_col).limit(1).collect()[0]
    centers = [(first[id_col], list(first[vec_col]))]

    def d2(vec):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in vec]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    state = pts.withColumn("__mind", d2(centers[0][1])).localCheckpoint(
        eager=True
    )
    for _ in range(k - 1):
        far = (
            state.orderBy(F.col("__mind").desc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        centers.append((far[id_col], list(far[vec_col])))
        if len(centers) < k:
            state = state.withColumn(
                "__mind", F.least(F.col("__mind"), d2(centers[-1][1]))
            ).localCheckpoint(eager=True)
    return centers
