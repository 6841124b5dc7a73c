"""End-to-end EMBEDDING pipeline — the vector side of corpus curation
(companion to examples/corpus_pipeline.py, which curates the text
side):

1. semantic dedup (SemDeDup): k-means-cell-bounded cosine pairs,
   min-id survivor — drops embedding-space near-duplicates before
   they bias retrieval / training;
2. signed random projection fingerprints (portable md5 hyperplanes)
   — the broadcast-free dimensionality reduction used for cheap
   bucketing downstream;
3. build a PERSISTENT IVF index over the surviving vectors (built
   once, queried many times — centroids + cell-partitioned inverted
   file on disk);
4. answer a probe batch from the index and measure recall@k against
   the exact broadcast-NLJ answer — the accuracy report that decides
   n_probe_cells in production.

Every stage is a library operator; the run report carries counts and
the measured recall so a pipeline owner can see the dedup rate and
the ANN quality in one place.
"""

from __future__ import annotations

import os
import sys

# allow `python examples/<name>.py` straight from a checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from dataflowex_spark.catalog import Catalog
from dataflowex_spark.operators.similarity import (
    ivf_build_index,
    ivf_search,
    knn_cosine_exact,
    semantic_dedup,
)


def run_embedding_pipeline(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    dedup_threshold: float = 0.35,
    k: int = 10,
    n_probes: int = 8,
    n_probe_cells: int = 6,
) -> dict[str, float]:
    emb = Catalog(spark, sf_dir)["embeddings"]
    report: dict[str, float] = {"ingested": emb.count()}

    # 1. semantic dedup — keep survivors only
    verdict = semantic_dedup(emb, threshold=dedup_threshold)
    kept = emb.join(
        verdict.filter("keep").select("vec_id"), "vec_id", "left_semi"
    )
    report["after_semantic_dedup"] = kept.count()

    # 2. random-projection fingerprints (8 planes) — materialize the
    # reduced representation alongside the survivors
    from dataflowex_spark.queries import REGISTRY

    proj_fn, _ = REGISTRY["q198_random_projection"]
    report["projection_rows"] = proj_fn(spark, sf_dir).count()

    # 3. persistent IVF index over the survivors
    ivf_build_index(kept, index_dir, n_cells=16)

    # 4. probe batch answered from the index; recall@k vs exact
    probes = emb.filter(F.col("vec_id") < n_probes)
    approx = ivf_search(
        probes, index_dir, k=k, n_probe_cells=n_probe_cells
    ).select("probe_id", "vec_id")
    exact = knn_cosine_exact(kept, probes, k=k).select("probe_id", "vec_id")
    hit = approx.join(exact, ["probe_id", "vec_id"], "left_semi").count()
    total = exact.count()
    report["recall_at_k"] = hit / total if total else 0.0
    return report


if __name__ == "__main__":
    import json
    import tempfile

    from dataflowex_spark.session import get_spark

    spark = get_spark("embedding-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="ivf_index_")
    print(
        json.dumps(
            run_embedding_pipeline(spark, "/root/testdata/sf0.01", out),
            indent=2,
        )
    )
