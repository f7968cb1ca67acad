"""ANN quality benchmark: IVF recall@k vs exact brute-force, by nprobe.

Correctness gates pin that ivf_topk returns the right vectors FOR ITS
CELLS; this measures the quality knob itself — what fraction of the true
top-k an nprobe-bounded search recovers, and what it costs — so the
recall/latency tradeoff the operator docs claim has recorded numbers
(BENCH_NOTES r6). Centroids come from the production path: label-seeded
``kmeans_fit`` to convergence.

Run: ``python scripts_ann_recall.py`` (sf0.1 embeddings, 2000x32-dim,
100 query vectors, k=10).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ralf_spark.operators.similarity import cosine_topk, ivf_topk, kmeans_fit
from ralf_spark.session import get_spark
from ralf_spark.sources.fixtures import load_fixture

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 100


def main() -> None:
    spark = get_spark(app_name="ann_recall",
                      extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_fixture(spark, "embeddings", SF_DIR)
    queries = (
        emb.df.orderBy(F.rand(11)).limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
        .cache()
    )
    queries.count()

    def topk_set(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    t0 = time.perf_counter()
    truth = topk_set(cosine_topk(emb, queries, k=K))
    brute_s = time.perf_counter() - t0

    print(f"| search | recall@{K} | random-cell baseline | wall |")
    print("|---|---|---|---|")
    print(f"| brute force (exact) | 1.000 | — | {brute_s:.2f}s |")
    for n_cells, seed_col in ((10, F.col("label")),
                              (32, F.col("vec_id") % 32)):
        seeds = (
            emb.df.groupBy(seed_col.alias("_g"))
            .agg(F.min_by("embedding", "vec_id").alias("centroid_vec"))
            .select(F.col("_g").cast("int").alias("centroid_id"),
                    "centroid_vec")
        )
        centroids = kmeans_fit(emb, seeds, max_iter=10)
        for nprobe in (1, 2, 4):
            t0 = time.perf_counter()
            got = topk_set(
                ivf_topk(emb, queries, centroids, k=K, nprobe=nprobe)
            )
            wall = time.perf_counter() - t0
            hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
            recall = hits / (len(truth) * K)
            # structureless corpus would give ~nprobe/cells
            base = nprobe / n_cells
            print(f"| IVF {n_cells} cells, nprobe={nprobe} | {recall:.3f} "
                  f"| {base:.3f} | {wall:.2f}s |")
    spark.stop()


if __name__ == "__main__":
    main()
