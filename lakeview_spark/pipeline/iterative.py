"""Iterative algorithms over the embedding corpus.

`kmeans_train` is the canonical Spark iterative-algorithm shape: a
driver loop of Lloyd's iterations where each step is a fully
distributed DataFrame job and the only driver state is the k×dim
centroid matrix (k x dim — broadcast-scale metadata, same class as
a dim table build side). The per-step pieces are already oracle-proven
elsewhere: the assignment step is `embedding_centroid_assign`
(similarity.py, hash-checked every round) and this loop simply replays
it against updated literal centroids.

Registered rows-only (the documented third exemption,
test_registry_hygiene.py): the centroid update is an element-wise MEAN
of doubles, and distributed float summation has no deterministic
cross-engine order, so after one update the fourth decimal of a
centroid — and with it any hash — can differ between Spark and DuckDB
even when both are correct. Iterative refinement is exactly the
"iterative algorithms" case the driver contract exempts; the
assignment math it iterates stays oracle-checked via
`embedding_centroid_assign` / `embedding_centroid_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.pipeline.similarity import centroid_seed_predicate, _dot, _norm
from lakeview_spark.plans.registry import register, t

_ITERATIONS = 3


def _assign(emb: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment against literal centroid vectors:
    broadcast k rows, score columnar, argmax per vector — the same plan
    shape as embedding_centroid_assign (similarity.py:360-392)."""
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(cid, [float(v) for v in vec]) for cid, vec in centroids],
        "cluster_id int, ce array<double>",
    )
    scored = emb.crossJoin(F.broadcast(cdf)).select(
        "vec_id",
        "embedding",
        "cluster_id",
        (_dot("embedding", "ce") / (_norm("embedding") * _norm("ce"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "cluster_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register("kmeans_train")  # rows-only: iterative float-mean updates (module docstring)
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means: {_ITERATIONS} assign/update rounds from the
    data-derived seeds (vec_id 1..k, corpus-sized k), then the final assignment's
    per-cluster report (size, cosine spread).

    Each update is one distributed job: posexplode the assigned vectors
    and average per (cluster, dimension) — an algebraic agg, so
    partial aggregation collapses every partition to <= k×dim rows
    before the (tiny, 256-key) shuffle. The driver holds only the
    centroid matrix between rounds; an empty cluster keeps its previous
    centroid (the standard Lloyd's guard)."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    centroids = [
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in emb.filter(centroid_seed_predicate(spark, sf_dir))
        .select("vec_id", "embedding")
        .collect()
    ]
    for _ in range(_ITERATIONS):
        assign = _assign(emb, centroids)
        upd = (
            assign.select("cluster_id", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cluster.setdefault(r.cluster_id, {})[r.pos] = r.m
        centroids = [
            (
                cid,
                [comp[i] for i in sorted(comp)] if (comp := by_cluster.get(cid)) else vec,
            )
            for cid, vec in centroids
        ]
    final = _assign(emb, centroids).join(emb.select("vec_id", "label"), "vec_id")
    return final.groupBy("cluster_id").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
        F.min("cosine").alias("min_cosine"),
        F.max("cosine").alias("max_cosine"),
    )
