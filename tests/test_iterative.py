"""kmeans_train: Lloyd's loop invariants (rows-only query — these tests
are its correctness gate in place of a DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.pipeline.iterative import _assign
from lakeview_spark.plans import QUERIES
from lakeview_spark.plans.registry import t

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_train_partitions_the_corpus(spark):
    out = QUERIES["kmeans_train"](spark, SF_DIR).collect()
    total = t(spark, SF_DIR, "embeddings").count()
    assert sum(r.n_vectors for r in out) == total  # every vector assigned once
    assert all(1 <= r.cluster_id <= 4 for r in out)
    assert all(-1.0 <= r.min_cosine <= r.max_cosine <= 1.0 for r in out)


def test_kmeans_iteration_does_not_decrease_objective(spark):
    """One Lloyd's round (assign -> mean update -> reassign) must not
    lower the mean best-cosine objective — the monotonicity that makes
    Lloyd's converge (up to float-mean noise; we allow 1e-9)."""
    emb = t(spark, SF_DIR, "embeddings").select("vec_id", "label", "embedding")
    seeds = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in emb.filter(F.col("vec_id").isin(1, 2, 3, 4))
        .select("vec_id", "embedding")
        .collect()
    ]

    def objective(centroids):
        return (
            _assign(emb, centroids).agg(F.avg("cosine").alias("o")).collect()[0].o
        )

    assign = _assign(emb, seeds)
    upd = (
        assign.select("cluster_id", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster_id", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    by_cluster = {}
    for r in upd:
        by_cluster.setdefault(r.cluster_id, {})[r.pos] = r.m
    updated = [
        (cid, [comp[i] for i in sorted(comp)] if (comp := by_cluster.get(cid)) else vec)
        for cid, vec in seeds
    ]
    assert objective(updated) >= objective(seeds) - 1e-9
