"""Dedup & similarity operators: correctness against brute force on
small synthetic corpora (MinHash/SimHash/LSH recall, kNN exactness)."""

import math
import random

import pytest
from pyspark.sql import Row, functions as F

from dataflowex_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    ngram_jaccard_pairs,
)
from dataflowex_spark.operators.similarity import knn_cosine_exact, knn_cosine_lsh
from dataflowex_spark.functions.vectors import cosine_similarity


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),  # exact dup of 0
        Row(doc_id=2, text=base.replace("dog", "cat")),  # near dup
        Row(doc_id=3, text="completely different words about spark shuffles and joins"),
        Row(doc_id=4, text="another unrelated document mentioning parquet and arrow"),
    ]
    return spark.createDataFrame(rows)


def test_dedup_exact_min_id_winner(docs):
    kept = dedup_exact(docs).select("doc_id").toPandas()["doc_id"].tolist()
    assert sorted(kept) == [0, 2, 3, 4]  # doc 1 removed, min-id kept


def test_minhash_finds_near_dups_not_unrelated(docs):
    # true J(0,2) ≈ 0.57; 32-hash estimate has σ≈0.09, so gate at 0.25
    pairs = dedup_minhash_lsh(
        docs, num_hashes=32, bands=16, jaccard_threshold=0.25
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup always collides
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert (3, 4) not in found  # unrelated don't pair


def test_simhash_pairs(docs):
    pairs = dedup_simhash(docs, hamming_threshold=3).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found
    assert all(r.hamming <= 3 for r in pairs)
    assert (3, 4) not in found


def test_ngram_jaccard_exact_values(docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()
    vals = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert vals[(0, 1)] == pytest.approx(1.0)  # identical docs
    assert (0, 2) in vals and vals[(0, 2)] < 1.0


@pytest.fixture(scope="module")
def vectors(spark):
    # clustered vectors: 8 centers + small noise, so nearest neighbors
    # are same-cluster (a signal LSH can actually exploit — pure
    # gaussian noise has no locality to preserve)
    rng = random.Random(42)
    centers = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(8)]
    rows = [
        Row(
            vec_id=i,
            embedding=[c + rng.gauss(0, 0.1) for c in centers[i % 8]],
        )
        for i in range(40)
    ]
    return spark.createDataFrame(rows)


def brute_force_topk(rows, probe_id, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    probe = next(r for r in rows if r.vec_id == probe_id)
    scored = [
        (cos(r.embedding, probe.embedding), r.vec_id)
        for r in rows
        if r.vec_id != probe_id
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [v for _, v in scored[:k]]


def test_knn_exact_matches_brute_force(vectors):
    rows = vectors.collect()
    out = knn_cosine_exact(vectors, vectors.filter(F.col("vec_id") == 0), k=5)
    got = [r.vec_id for r in out.orderBy("rank").collect()]
    assert got == brute_force_topk(rows, 0, 5)


def test_knn_lsh_recall(vectors):
    """LSH top-5 should recover most of the true top-5 (recall ≥ 0.6
    with 4 tables of 4 planes on 40 vectors)."""
    rows = vectors.collect()
    probes = vectors.filter(F.col("vec_id") < 5)
    out = knn_cosine_lsh(
        vectors, probes, k=5, dim=16, n_planes=4, n_tables=4
    ).collect()
    hits = total = 0
    for pid in range(5):
        truth = set(brute_force_topk(rows, pid, 5))
        got = {r.vec_id for r in out if r.probe_id == pid}
        hits += len(truth & got)
        total += 5
    assert hits / total >= 0.6


def test_knn_lsh_plan_size_independent_of_config(spark):
    """Hyperplanes ride a broadcast DataFrame, not plan literals: the
    logical plan must NOT grow with dim × n_planes × n_tables. A
    realistic 768-dim/16-plane/8-table config is ~100k coefficients —
    baked in as literals it would be the Catalyst plan-explosion class
    the IVF centroid fix already closed."""
    import random

    rng = random.Random(3)

    def frame(dim):
        return spark.createDataFrame(
            [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(dim)])
             for i in range(6)]
        )

    def plan_len(dim, n_planes, n_tables):
        df = knn_cosine_lsh(
            frame(dim), frame(dim), k=2, dim=dim,
            n_planes=n_planes, n_tables=n_tables,
        )
        return len(df._jdf.queryExecution().optimizedPlan().toString())

    small = plan_len(8, 2, 2)
    big = plan_len(768, 16, 8)
    # 768×16×8 = ~98k coefficients; as literals the plan would be MBs.
    # Broadcast planes keep it the same handful of operators.
    assert big < small * 2, (small, big)


def test_cosine_expression_value(spark):
    df = spark.createDataFrame([Row(a=[1.0, 0.0], b=[0.0, 1.0]), Row(a=[1.0, 1.0], b=[1.0, 1.0])])
    out = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()
    assert out[0].c == pytest.approx(0.0)
    assert out[1].c == pytest.approx(1.0)


def test_knn_ivf_recall(vectors):
    """IVF with clustered data: searching 3 of 8 cells recovers most
    true neighbors (same-cluster vectors share a cell by construction)."""
    from dataflowex_spark.operators.similarity import knn_cosine_ivf

    rows = vectors.collect()
    probes = vectors.filter(F.col("vec_id") < 5)
    out = knn_cosine_ivf(
        vectors, probes, k=4, n_cells=8, n_probe_cells=3
    ).collect()
    hits = total = 0
    for pid in range(5):
        truth = set(brute_force_topk(rows, pid, 4))
        got = {r.vec_id for r in out if r.probe_id == pid}
        hits += len(truth & got)
        total += 4
    assert hits / total >= 0.7


def test_minhash_mllib_variant(docs):
    from dataflowex_spark.operators.dedup import dedup_minhash_mllib

    pairs = dedup_minhash_mllib(
        docs, num_hash_tables=8, jaccard_distance_threshold=0.7
    ).collect()
    found = {(r.id_a, r.id_b): r.jaccard_dist for r in pairs}
    assert (0, 1) in found and found[(0, 1)] == pytest.approx(0.0)  # exact dup
    assert any(p in found for p in [(0, 2), (1, 2)])  # near dup found
    assert (3, 4) not in found


def test_dedup_clusters_transitive(spark):
    """Pairs chain transitively: {1-2, 2-3} and {7-8} form two
    components labeled by their min ids."""
    from dataflowex_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=7, id_b=8)]
    )
    got = {r.node: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_dedup_clusters_long_chain(spark):
    """A 12-node path graph — forces several propagation rounds."""
    from dataflowex_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(12)])
    got = {r.node: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 13


def test_decontaminate_ngram_overlap(spark):
    """Docs sharing a 3-gram with the benchmark are dropped; the
    audit mode returns exactly the flagged rows; both joins broadcast
    the small side (corpus never shuffles)."""
    from dataflowex_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely unrelated words here entirely"),
            Row(doc_id=3, text="a quick brown fox appears in this sentence too"),
            Row(doc_id=4, text="short doc"),  # < n tokens: whole-doc shingle
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="watch the quick brown fox benchmark item")]
    )
    clean = decontaminate(corpus, bench, n=3)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 4]
    flagged = decontaminate(corpus, bench, n=3, return_contaminated=True)
    assert sorted(r.doc_id for r in flagged.collect()) == [1, 3]
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # both joins broadcast


def test_dedup_clusters_nonconvergence_raises(spark):
    """A component deeper than max_iters must raise, not silently
    return split clusters (strict=False opts into partial labels)."""
    import pytest
    from dataflowex_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(12)])
    with pytest.raises(RuntimeError, match="max_iters"):
        dedup_clusters(pairs, max_iters=2)
    partial = dedup_clusters(pairs, max_iters=2, strict=False)
    assert partial.count() == 13  # partial labels still delivered


def test_minhash_lsh_cross_consistent_with_self_join(spark, sf_dir):
    """Cross-corpus LSH over (X, X) must reproduce the self-join
    pairs exactly (plus the trivial identity matches), and identity
    matches must estimate jaccard 1.0."""
    from dataflowex_spark.operators.dedup import (
        dedup_minhash_lsh,
        minhash_lsh_cross,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    self_pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup_minhash_lsh(docs, jaccard_threshold=0.5).collect()
    }
    cross = minhash_lsh_cross(docs, docs, jaccard_threshold=0.5).collect()
    ident = [r for r in cross if r.id_a == r.id_b]
    assert len(ident) == docs.count()
    assert all(r.est_jaccard == 1.0 for r in ident)
    cross_pairs = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.est_jaccard
        for r in cross
        if r.id_a != r.id_b
    }
    assert cross_pairs == self_pairs


def test_minhash_lsh_cross_novelty_filter(spark):
    """The incremental-curation use: new-batch docs near-duplicating
    the existing corpus are flagged; novel docs survive."""
    from pyspark.sql import Row
    from dataflowex_spark.operators.dedup import minhash_lsh_cross

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    existing = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="completely different corpus content entirely " * 4)]
    )
    new = spark.createDataFrame(
        [
            Row(doc_id=100, text=base + "tail"),  # near-dup of 1
            Row(doc_id=101, text="fresh novel writing about unrelated topics " * 4),
        ]
    )
    hits = minhash_lsh_cross(new, existing, jaccard_threshold=0.5)
    flagged = {r.id_a for r in hits.collect()}
    assert flagged == {100}
    novel = new.join(hits.select("id_a").distinct(),
                     new["doc_id"] == F.col("id_a"), "left_anti")
    assert {r.doc_id for r in novel.collect()} == {101}


def test_containment_catches_subsumed_doc(spark):
    """A short doc quoted whole inside a long one: symmetric Jaccard
    is low (misses it) but containment is 1.0 (catches it), and the
    direction is short-contained-in-long only."""
    from dataflowex_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long = filler + " " + short + " " + " ".join(f"z{i} q{i}" for i in range(40))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long)]
    )
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert jac == []  # symmetric metric misses the subsumption
    cont = ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.containment) for r in cont] == [(1, 2, 1.0)]


def test_fuzzy_pairs_semantics(spark):
    """fuzzy_pairs finds same-block pairs within the edit budget,
    applies the length necessary-condition, and (documented trade)
    misses pairs whose first token was edited."""
    from dataflowex_spark.operators.dedup import fuzzy_pairs

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="alpha beta gamna"),   # dist 1, same block
            Row(doc_id=3, text="alpha beta GAMMA!"),  # dist 6, same block
            Row(doc_id=4, text="alpht beta gamma"),   # dist 1 but first token edited
            Row(doc_id=5, text="zeta beta gamma"),    # other block
        ]
    )
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs(docs, max_dist=3, prefix_len=40).collect()
    }
    assert got == {(1, 2): 1}  # 3 fails verify; 4 blocked out; 5 other block


def test_stop_gram_prefilter_exact_scores(spark):
    """max_gram_df excludes ubiquitous grams from CANDIDATE GENERATION
    only: surviving pairs keep exact jaccard/containment (intersections
    recomputed over full gram sets), and a pair whose only shared
    grams are stop grams is dropped — the quadratic-blowup guard."""
    from dataflowex_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    boiler = "terms of service apply"  # the gram every doc shares
    rows = [
        (1, f"alpha beta gamma delta epsilon {boiler}"),
        (2, f"alpha beta gamma delta epsilon zeta {boiler}"),
        (3, f"omega psi chi phi upsilon {boiler}"),
        (4, f"omega psi chi phi upsilon tau {boiler}"),
        # 5 shares ONLY the boilerplate with everyone
        (5, f"one two three four five {boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.05).collect()
    }
    filtered = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, n=3, threshold=0.05, max_gram_df=2
        ).collect()
    }
    # real near-dup pairs survive with IDENTICAL scores
    assert (1, 2) in filtered and (3, 4) in filtered
    for pair, j in filtered.items():
        assert abs(exact[pair] - j) < 1e-12
    # boilerplate-only pairs existed in the exact run but are pruned
    assert any(5 in p for p in exact)
    assert not any(5 in p for p in filtered)

    cont_exact = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(df, n=3, threshold=0.05).collect()
    }
    cont_filtered = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(
            df, n=3, threshold=0.05, max_gram_df=2
        ).collect()
    }
    assert (1, 2) in cont_filtered and (2, 1) in cont_filtered
    for pair, c in cont_filtered.items():
        assert abs(cont_exact[pair] - c) < 1e-12
    assert not any(5 in p for p in cont_filtered)


def test_ivf_index_persist_and_search(spark, tmp_path):
    """ivf_build_index / ivf_search: build once, answer multiple probe
    batches without re-running k-means; hits agree with exact kNN on
    well-separated clusters, and the assignment scan is partitioned by
    cell (the on-disk inverted file)."""
    import os

    from dataflowex_spark.operators.similarity import (
        ivf_build_index,
        ivf_search,
        knn_cosine_exact,
    )

    # three tight clusters in 8-d
    def vec(center, j):
        base = [0.0] * 8
        base[center] = 10.0
        base[(center + 1) % 8] = 1.0 + 0.01 * j
        return base

    rows = [
        (c * 100 + j, vec(c, j)) for c in range(3) for j in range(30)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(corpus, idx, n_cells=3, seed=7)
    # the inverted file: one directory per cell
    cells = [
        d for d in os.listdir(os.path.join(idx, "assignments"))
        if d.startswith("__cell=")
    ]
    assert len(cells) == 3

    probes = corpus.filter(F.col("vec_id").isin([5, 105, 205]))
    got = ivf_search(probes, idx, k=5, n_probe_cells=1)
    exact = knn_cosine_exact(corpus, probes, k=5)
    g = {(r.probe_id, r.vec_id) for r in got.collect()}
    e = {(r.probe_id, r.vec_id) for r in exact.collect()}
    assert g == e  # perfect recall on separated clusters
    # second probe batch reuses the index (no rebuild, fresh probes)
    probes2 = corpus.filter(F.col("vec_id").isin([17, 211]))
    got2 = ivf_search(probes2, idx, k=3, n_probe_cells=1)
    assert got2.count() == 6


def test_prefix_filter_jaccard_matches_blocking_path(spark, sf_dir):
    """Prefix filtering is exact: the PPJoin-style join returns the
    SAME pair set (and bit-equal scores) as the share-a-gram
    inverted-index path, while generating a subset of its candidate
    pairs (the prefix can only shrink the blocking)."""
    from dataflowex_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_prefix = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in jaccard_prefix_pairs(
            docs, n=4, threshold=0.4, use_words=True
        ).collect()
    }
    via_blocking = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in ngram_jaccard_pairs(docs, n=4, threshold=0.4)
        .selectExpr("id_a", "id_b", "jaccard")
        .collect()
    }
    assert via_prefix == via_blocking
    assert len(via_prefix) > 0  # non-vacuous on the clone corpus


def test_prefix_filter_prunes_hot_gram_candidates(spark):
    """A boilerplate gram shared by EVERY doc must not key the
    candidate join: docs that only share the hot gram (similarity far
    below threshold) produce no candidate collision, while true
    near-dups survive. (Share-a-gram blocking would pair all docs.)"""
    from pyspark.sql import functions as F

    from dataflowex_spark.operators.dedup import jaccard_prefix_pairs

    boiler = "terms of service apply to this page"
    uniq = [
        f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i} eta{i} theta{i}"
        for i in range(30)
    ]
    rows = [(i, f"{uniq[i]} {boiler}") for i in range(30)]
    # one true near-dup pair: doc 30 clones doc 0 with a one-word tail edit
    rows.append((30, f"{uniq[0]} {boiler} extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_prefix_pairs(df, n=3, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (0, 30) in pairs
    # nothing else reaches the threshold — and in particular the
    # all-docs boilerplate gram did not explode the candidate set
    assert all(p == (0, 30) for p in pairs)


def test_hard_negatives_label_constraint_and_ranking(spark):
    """Every mined negative has a different label than its anchor and
    is the true nearest such vector (brute-force check)."""
    import numpy as np
    from dataflowex_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(12)
    X = rng.normal(size=(120, 8)).astype(np.float64)
    labels = rng.integers(0, 3, 120)
    df = spark.createDataFrame(
        [
            (i, [float(v) for v in X[i]], int(labels[i]))
            for i in range(120)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    anchors = df.filter("vec_id < 4")
    got = hard_negatives(df, anchors, k=3).collect()
    lbl = {i: labels[i] for i in range(120)}
    by_anchor: dict = {}
    for r in got:
        assert lbl[r["anchor_id"]] != lbl[r["vec_id"]]
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    Xf = np.stack([X[i] / np.linalg.norm(X[i]) for i in range(120)])
    # float32 storage: recompute sims from the rounded vectors
    Xs = np.stack(
        [
            np.array([float(np.float32(v)) for v in X[i]])
            for i in range(120)
        ]
    )
    Xs = Xs / np.linalg.norm(Xs, axis=1, keepdims=True)
    for a, rows in by_anchor.items():
        assert len(rows) == 3
        sims = Xs @ Xs[a]
        mask = labels != labels[a]
        mask[a] = False
        order = sorted(
            np.where(mask)[0], key=lambda i: (-sims[i], i)
        )[:3]
        got_ids = [r["vec_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got_ids == list(order)


def test_lsh_index_incremental_equals_cross(spark, sf_dir, tmp_path):
    """Persisted LSH index: probe(batch) == minhash_lsh_cross(batch,
    corpus) exactly; after append, a second probe sees the first
    batch too; and the probe plan reads the bucketed index WITHOUT an
    index-side exchange (only the batch side shuffles)."""
    import re

    from dataflowex_spark.operators.dedup import (
        lsh_index_append,
        lsh_index_build,
        lsh_index_probe,
        minhash_lsh_cross,
    )
    from dataflowex_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch1 = docs.filter(F.col("doc_id") % 3 == 1)
    batch2 = docs.filter(F.col("doc_id") % 3 == 2)

    name = "lsh_idx_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        lsh_index_build(corpus, str(tmp_path / "idx"), name, bands=8)

        got = lsh_index_probe(batch1, name, jaccard_threshold=0.5)
        want = minhash_lsh_cross(
            batch1, corpus, jaccard_threshold=0.5
        )
        g = sorted((r[0], r[1], round(r[2], 6)) for r in got.collect())
        w = sorted((r[0], r[1], round(r[2], 6)) for r in want.collect())
        assert g == w and len(g) > 0

        # index side must not shuffle: the index scan is bucketed and
        # the only shuffle Exchanges are the candidate-pair distinct
        # (and, if the batch is too big to broadcast, the probe side)
        # — never a re-shuffle of the full index
        plan = formatted_plan(got)
        assert "Bucketed: true" in plan, plan
        # distinct node ids: the AQE dump repeats the tree (final +
        # initial plan + node details), so count unique Exchange nodes
        shuffles = set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan))
        assert len(shuffles) <= 2, plan  # one per plan copy: the
        # candidate-distinct agg; the index itself never re-shuffles

        lsh_index_append(batch1, name)
        got2 = lsh_index_probe(batch2, name, jaccard_threshold=0.5)
        want2 = minhash_lsh_cross(
            batch2, corpus.unionByName(batch1), jaccard_threshold=0.5
        )
        g2 = sorted((r[0], r[1], round(r[2], 6)) for r in got2.collect())
        w2 = sorted((r[0], r[1], round(r[2], 6)) for r in want2.collect())
        assert g2 == w2 and len(g2) >= len(g)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_dedup_clusters_star_equals_minlabel_and_handles_chains(spark):
    """Alternating large-star/small-star CC: (1) identical labels to
    the min-label operator on a random multi-component graph;
    (2) a 1000-node CHAIN — diameter 999, where min-label at its
    default max_iters would fail — resolves in the star algorithm's
    O(log n) rounds to a single component."""
    import random as _random

    from dataflowex_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    rng = _random.Random(11)
    edges = []
    for comp in range(20):  # 20 components of ~15 random nodes
        ids = [comp * 1000 + i for i in range(rng.randint(2, 15))]
        for x in ids[1:]:
            edges.append((rng.choice(ids[: ids.index(x)]), x))
        for _ in range(5):
            edges.append((rng.choice(ids), rng.choice(ids)))
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    star = {
        r["node"]: r["cluster_id"]
        for r in dedup_clusters_star(pairs).collect()
    }
    base = {
        r["node"]: r["cluster_id"]
        for r in dedup_clusters(pairs, max_iters=40).collect()
    }
    assert star == base and len(star) > 100

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup_clusters_star(chain, max_iters=30).collect()
    }
    assert len(got) == 1000 and set(got.values()) == {0}


def test_lsh_index_delete_and_compact(spark, sf_dir, tmp_path):
    """Persisted-index maintenance (r6 verdict item 4): (1) deleting
    ids is a metadata op — tombstones hide them from the next probe
    while the bucketed files are untouched; (2) compaction physically
    removes exactly the tombstoned signature rows, clears the
    tombstones, keeps the table bucketed (probe still plans with the
    bucketed scan, no index-side exchange), and probe results equal a
    fresh index built without the deleted docs; (3) compact with no
    tombstones is a no-op."""
    from dataflowex_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_compact,
        lsh_index_delete,
        lsh_index_probe,
    )
    from dataflowex_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 == 1)

    name = "lsh_idx_maint_test"
    for t in (name, f"{name}_tomb", f"{name}_staged"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        lsh_index_build(corpus, str(tmp_path / "idx"), name, bands=8)
        base = lsh_index_probe(batch, name, jaccard_threshold=0.5)
        base_pairs = sorted(
            (r[0], r[1], round(r[2], 6)) for r in base.collect()
        )
        assert base_pairs
        # delete every indexed doc that matched anything
        # materialize the victim ids NOW: the lazy frame references
        # index files that compaction below will physically remove
        keep_ids = {
            r["doc_id"]
            for r in base.select(
                F.col("id_indexed").alias("doc_id")
            ).distinct().collect()
        }
        victims = spark.createDataFrame(
            [(i,) for i in sorted(keep_ids)], "doc_id long"
        )
        assert lsh_index_delete(spark, name, victims) == len(keep_ids)

        # (1) tombstoned: the probe sees none of them, files untouched
        after_del = lsh_index_probe(batch, name, jaccard_threshold=0.5)
        assert after_del.count() == 0
        rows_physical = spark.table(name).count()

        # (3 pre-check) compact removes exactly the victims' rows
        removed = lsh_index_compact(spark, name, n_buckets=16)
        assert removed > 0
        assert spark.table(name).count() == rows_physical - removed
        assert not spark.catalog.tableExists(f"{name}_tomb")

        # (2) equals a fresh index without the victims; still bucketed
        fresh_name = f"{name}_fresh"
        spark.sql(f"DROP TABLE IF EXISTS {fresh_name}")
        try:
            lsh_index_build(
                corpus.filter(~F.col("doc_id").isin(list(keep_ids))),
                str(tmp_path / "idx_fresh"),
                fresh_name,
                bands=8,
            )
            got = lsh_index_probe(batch, name, jaccard_threshold=0.5)
            want = lsh_index_probe(
                batch, fresh_name, jaccard_threshold=0.5
            )
            assert sorted(tuple(r) for r in got.collect()) == sorted(
                tuple(r) for r in want.collect()
            )
            assert "Bucketed: true" in formatted_plan(got)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {fresh_name}")

        # (3) idempotent: nothing left to compact
        assert lsh_index_compact(spark, name) == 0
    finally:
        for t in (name, f"{name}_tomb", f"{name}_staged"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_recall_audit_monotone_and_bounded(spark, sf_dir, tmp_path):
    """IVF nprobe recall/cost audit: recall@k is 1.0 when every cell
    is probed (exhaustive == exact by construction), non-decreasing
    in n_probe, above a floor at a fixed working point, and the
    candidate cost grows with n_probe — the curve a deployment picks
    its operating point from."""
    from dataflowex_spark.operators.similarity import (
        ivf_build_index,
        ivf_recall_audit,
        knn_cosine_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 30)
    ivf_build_index(emb, str(tmp_path / "ivf"), n_cells=8)
    exact = knn_cosine_exact(emb, probes, k=5)
    audit = ivf_recall_audit(
        probes, str(tmp_path / "ivf"), [1, 2, 4, 8], exact, k=5
    ).collect()
    rows = {r["n_probe"]: r for r in audit}
    assert list(rows) == [1, 2, 4, 8]
    recalls = [rows[n]["recall_at_k"] for n in (1, 2, 4, 8)]
    costs = [rows[n]["avg_candidates"] for n in (1, 2, 4, 8)]
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls  # all cells probed == exact
    assert recalls[1] >= 0.5, recalls   # working-point floor (nprobe=2)
    assert costs == sorted(costs) and costs[0] < costs[-1], costs
    assert all(r["n_probes"] == 30 for r in audit)


def test_cdc_chunk_dedup_offset_invariance(spark):
    """The property that makes content-defined chunking work: a
    passage shared by two documents chunks IDENTICALLY even though
    its token offset differs (different-length prefixes), so the
    shared chunks collide by hash — where fixed-size blocking at
    mismatched offsets finds nothing. Short docs (< w tokens) fall
    back to one whole-doc chunk; unique-content docs contribute no
    multi-doc chunk group."""
    from dataflowex_spark.operators.dedup import cdc_chunk_dedup

    # a long shared passage with deterministic varied tokens
    passage = " ".join(f"tok{i * 7 % 101}x{i}" for i in range(120))
    docs = spark.createDataFrame(
        [
            (1, "short prefix " + passage),
            (
                2,
                " ".join(f"pre{j}" for j in range(17))
                + " "
                + passage,
            ),
            (3, "entirely unrelated content " * 30),
            # identical short docs: one whole-doc chunk each, shared
            (4, "tiny shared doc"),
            (5, "tiny shared doc"),
        ],
        "doc_id long, text string",
    )
    out = cdc_chunk_dedup(docs, w=8, min_tokens=3, min_docs=2).collect()
    assert out, "shared passage must produce multi-doc chunk groups"
    # every reported group spans >=2 docs with sane lengths
    assert all(r["n_docs"] >= 2 and r["tok_len"] >= 3 for r in out)
    # docs 1+2 share interior chunks despite different prefix lengths:
    # at least one group must span exactly those two (n_occ == n_docs)
    assert any(r["n_docs"] == 2 and r["n_occ"] == 2 for r in out)

    # unique doc contributes nothing: rerun without the shared pair
    solo = cdc_chunk_dedup(
        docs.where(F.col("doc_id").isin(1, 3)), w=8, min_tokens=3
    )
    assert solo.count() == 0


def test_pq_adc_recovers_separated_clusters_and_is_deterministic(spark):
    """PQ-ADC sanity: on well-separated clusters every top-k
    candidate comes from the probe's own cluster (quantization
    erases WITHIN-cluster order — same codes, tied ADC distance —
    but must never cross clusters), and the whole train+search
    pipeline is bit-stable across runs (quantized integer
    distances, id tie-breaks, lowest-id init)."""
    from dataflowex_spark.operators.similarity import (
        pq_adc_search,
        pq_recall_audit,
        pq_train,
    )

    # 4 tight clusters of 10 vectors in 8-dim space
    rows = []
    for c in range(4):
        base = [10.0 * (c + 1) if d % 4 == c else 0.0 for d in range(8)]
        for i in range(10):
            rows.append(
                (
                    c * 10 + i,
                    [x + 0.01 * ((i * 7 + d) % 5) for d, x in enumerate(base)],
                )
            )
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    probes = vecs.where(F.col("vec_id") % 10 == 0)  # one per cluster
    cent, codes = pq_train(vecs, m_sub=4, n_codes=8, iters=4, dim=8)
    top = pq_adc_search(
        cent, codes, probes, k=3, m_sub=4, dim=8
    ).collect()
    assert len(top) == 4 * 3
    # never a cross-cluster candidate (cluster = vec_id // 10)
    assert all(r["probe_id"] // 10 == r["vec_id"] // 10 for r in top), top

    out = pq_recall_audit(
        vecs, probes, k=3, m_sub=4, n_codes=8, iters=4, dim=8
    ).collect()
    out2 = pq_recall_audit(
        vecs, probes, k=3, m_sub=4, n_codes=8, iters=4, dim=8
    ).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in out2]


def test_pq_audit_driver_matches_distributed(spark, sf_dir):
    """The bounded-corpus numpy path of pq_recall_audit must replay
    the distributed computation BIT-IDENTICALLY — same Lloyd
    assignments (quantized distances, lowest-code ties), same
    integer-sum centroid updates, same ADC and exact top-k with id
    tie-breaks — on both a synthetic fixture and the real
    embeddings table."""
    from dataflowex_spark.operators.similarity import (
        _pq_recall_audit_dist,
        _pq_recall_audit_driver,
    )

    # synthetic: clustered + a few ties by construction
    rows = []
    for c in range(4):
        base = [10.0 * (c + 1) if d % 4 == c else 0.0 for d in range(8)]
        for i in range(10):
            rows.append(
                (
                    c * 10 + i,
                    [x + 0.01 * ((i * 7 + d) % 5) for d, x in enumerate(base)],
                )
            )
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = vecs.where(F.col("vec_id") % 10 == 0)
    a = _pq_recall_audit_driver(
        vecs, probes, 3, 4, 8, 4, "embedding", "vec_id", 8
    ).collect()
    b = _pq_recall_audit_dist(
        vecs, probes, 3, 4, 8, 4, "embedding", "vec_id", 8
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # real table, the q350 configuration (smaller sf for runtime)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pr = emb.orderBy("vec_id").limit(20)
    a = _pq_recall_audit_driver(
        emb, pr, 10, 16, 64, 4, "embedding", "vec_id", 64
    ).collect()
    b = _pq_recall_audit_dist(
        emb, pr, 10, 16, 64, 4, "embedding", "vec_id", 64
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_psnr_ssim_reference_behavior(spark):
    """Identity, ordering under noise, and the distributed pass."""
    import numpy as np

    from dataflowex_spark.operators.multimodal import (
        encode_ppm,
        image_quality_metrics,
        psnr_ssim,
    )

    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    assert psnr_ssim(a, a) == (99.0, 1.0)
    light = np.clip(a.astype(int) + rng.randint(-3, 4, a.shape), 0, 255)
    heavy = np.clip(a.astype(int) + rng.randint(-60, 61, a.shape), 0, 255)
    p1, s1 = psnr_ssim(a, light.astype(np.uint8))
    p2, s2 = psnr_ssim(a, heavy.astype(np.uint8))
    assert p1 > p2 and s1 > s2 and -1.0 <= s2 <= s1 <= 1.0
    import pytest as _pt

    with _pt.raises(ValueError, match="shape"):
        psnr_ssim(a, a[:16])
    with _pt.raises(ValueError, match="window"):
        psnr_ssim(a[:4, :4], a[:4, :4])

    rows = [
        ("same", encode_ppm(a), encode_ppm(a)),
        ("noisy", encode_ppm(a), encode_ppm(heavy.astype(np.uint8))),
        ("broken", encode_ppm(a), b"not an image"),
        ("missing", encode_ppm(a), None),
    ]
    df = spark.createDataFrame(
        rows, "uri string, payload binary, degraded binary"
    )
    got = {
        r["id"]: (r["psnr_db"], r["ssim"])
        for r in image_quality_metrics(df).collect()
    }
    assert got["same"] == (99.0, 1.0)
    assert got["noisy"][0] < 99.0 and got["noisy"][1] < 1.0
    assert got["broken"] == (None, None)
    assert got["missing"] == (None, None)


def test_kcenter_picks_one_anchor_per_planted_cluster(spark):
    import numpy as np

    from dataflowex_spark.operators.similarity import kcenter_select

    rng = np.random.RandomState(3)
    rows = []
    # 4 tight clusters far apart
    for c in range(4):
        center = np.zeros(8)
        center[c * 2] = 100.0
        for i in range(25):
            v = center + rng.normal(0, 0.5, 8)
            rows.append((c * 100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centers = kcenter_select(df, k=4)
    clusters = {cid // 100 for cid, _vec in centers}
    assert clusters == {0, 1, 2, 3}  # one anchor per planted cluster
    # deterministic across runs
    again = kcenter_select(df, k=4)
    assert [c[0] for c in centers] == [c[0] for c in again]
