"""Label-aware embedding evaluation and pair sampling.

The embeddings table carries a `label` column (class id). Three ops use
it the way a training pipeline does:

- `embedding_label_purity` — per k-means cluster, the majority-label
  share: the supervised readout of unsupervised cluster quality (a
  SemDeDup-style clustering whose clusters mix labels is mixing
  semantics, so its "near-duplicates" are not).
- `embedding_knn_label_accuracy` — leave-one-out kNN label vote inside
  the LSH buckets: the classic intrinsic embedding-quality probe (does
  the metric space agree with the labels?), computed on the same
  bucket-restricted candidate sets the ANN queries use, so it doubles
  as an audit that bucketing preserves label structure.
- `contrastive_pair_sample` — deterministic positive/negative pair
  sampling for contrastive finetuning: consecutive vectors inside
  corpus-sized hash buckets, labeled positive (same class) or negative,
  with their exact cosine — no RNG state, reproducible under any
  partitioning.

All cosines are the engine's left-fold doubles (similarity._dot), so
every ranking and tiebreak is bit-identical to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t
from lakeview_spark.pipeline.similarity import (
    _ANN_BUCKETED_SQL,
    _ASSIGN_SQL,
    _DOT_SQL,
    _NORM_SQL,
    _PLANES_SQL,
    _dot,
    _lsh_bucketed,
    corpus_n,
)
from lakeview_spark.pipeline.similarity import (
    embedding_centroid_assign as _assign,
)

# neighbors consulted by the leave-one-out label vote
KNN_VOTE_K = 5

# target rows per contrastive-sampling hash bucket: the window
# partitions below hold ~this many rows at ANY corpus size (bucket
# count = n // PAIR_BUCKET_ROWS, the _k_for_n/_recall_mod_for_n sizing
# device), so the per-partition sort never grows with n
PAIR_BUCKET_ROWS = 64


@register(
    "embedding_label_purity",
    oracle=f"""
    WITH assign AS ({_ASSIGN_SQL}),
    cl AS (
      SELECT cluster_id, label, count(*) AS cnt
      FROM assign GROUP BY cluster_id, label
    ),
    r AS (
      SELECT cluster_id, label, cnt,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY cnt DESC, label) AS rn,
             sum(cnt) OVER (PARTITION BY cluster_id) AS n
      FROM cl
    )
    SELECT cluster_id, CAST(n AS BIGINT) AS n_vectors,
           label AS majority_label, CAST(cnt AS BIGINT) AS majority_n,
           CAST(cnt AS DOUBLE) / n AS purity
    FROM r WHERE rn = 1
    """,
)
def embedding_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-label purity per k-means cluster: cluster size, the
    most frequent label inside it (ties -> smaller label id), and that
    label's share. Purity is the log-free cluster-homogeneity metric
    (entropy would need log(), which is not correctly rounded across
    engines — CLAUDE.md float rules), and the per-cluster row set is
    the work list for "inspect the impure clusters".

    Scale shape: rides the materialized centroid assignment; the
    (cluster, label) pre-aggregation is one shuffle on a k x labels
    key space, and the majority window partitions hold at most
    n_labels rows each."""
    cl = (
        _assign(spark, sf_dir)
        .groupBy("cluster_id", "label")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("cluster_id")
    r = cl.select(
        "cluster_id",
        "label",
        "cnt",
        F.row_number()
        .over(w.orderBy(F.desc("cnt"), "label"))
        .alias("rn"),
        F.sum("cnt").over(w).alias("n"),
    )
    return r.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("n").cast("bigint").alias("n_vectors"),
        F.col("label").alias("majority_label"),
        F.col("cnt").cast("bigint").alias("majority_n"),
        (F.col("cnt").cast("double") / F.col("n")).alias("purity"),
    )


@register(
    "embedding_knn_label_accuracy",
    oracle=f"""
    WITH planes AS ({_PLANES_SQL}),
    bucketed AS ({_ANN_BUCKETED_SQL}),
    pairs AS (
      SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS nid,
             b.label AS nlabel,
             {_DOT_SQL.format(a="a.embedding", b="b.embedding")}
               / (a.norm * b.norm) AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    topk AS (
      SELECT qid, qlabel, nlabel FROM (
        SELECT qid, qlabel, nlabel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rn
        FROM pairs
      ) WHERE rn <= {KNN_VOTE_K}
    ),
    votes AS (
      SELECT qid, qlabel, nlabel, count(*) AS cnt
      FROM topk GROUP BY qid, qlabel, nlabel
    ),
    pred AS (
      SELECT qid, qlabel, nlabel AS pred_label FROM (
        SELECT qid, qlabel, nlabel,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cnt DESC, nlabel) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT qlabel AS label, count(*) AS n_scored,
           CAST(sum(CASE WHEN pred_label = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN pred_label = qlabel THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS accuracy
    FROM pred GROUP BY qlabel
    """,
)
def embedding_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN label vote over the LSH buckets: each vector's
    top-KNN_VOTE_K same-bucket neighbors by cosine vote with their
    labels (majority; ties -> smaller label id), and the vote is scored
    against the vector's own label, reported per class. High accuracy
    means the embedding metric agrees with the labels AND the LSH
    bucketing preserves that structure; vectors alone in their bucket
    cast no vote and are excluded (n_scored counts the scored ones).

    Scale shape: the candidate join is the bucketed-parquet self-join
    on `bucket` (zero-exchange past broadcast, same as the near-dup
    pair query), bucket occupancy is held ~constant by the
    corpus-derived plane count, and the vote windows partition on qid
    with <= bucket-size rows each."""
    idx = _lsh_bucketed(spark, sf_dir)
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("qid"),
            F.col("a.label").alias("qlabel"),
            F.col("b.vec_id").alias("nid"),
            F.col("b.label").alias("nlabel"),
            (
                _dot("a.embedding", "b.embedding")
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    topk = (
        pairs.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= KNN_VOTE_K)
        .select("qid", "qlabel", "nlabel")
    )
    votes = topk.groupBy("qid", "qlabel", "nlabel").agg(F.count("*").alias("cnt"))
    wv = Window.partitionBy("qid").orderBy(F.desc("cnt"), "nlabel")
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", F.col("nlabel").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("qlabel"), 1).otherwise(0)
    return pred.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").alias("n_scored"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        (F.sum(correct).cast("double") / F.count("*")).alias("accuracy"),
    )


@register(
    "contrastive_pair_sample",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding,
             vec_id % (SELECT GREATEST(count(*) // {PAIR_BUCKET_ROWS}, 1)
                       FROM embeddings) AS bkt
      FROM embeddings
    ),
    p AS (
      SELECT vec_id AS anchor_id, label AS anchor_label,
             embedding AS ae,
             lead(vec_id) OVER w AS partner_id,
             lead(label) OVER w AS partner_label,
             lead(embedding) OVER w AS pe
      FROM b WINDOW w AS (PARTITION BY bkt ORDER BY vec_id)
    )
    SELECT anchor_id, partner_id, anchor_label, partner_label,
           CASE WHEN anchor_label = partner_label
                THEN 'positive' ELSE 'negative' END AS pair_type,
           {_DOT_SQL.format(a="ae", b="pe")}
             / ({_NORM_SQL.format(a="ae")} * {_NORM_SQL.format(a="pe")})
             AS cosine
    FROM p WHERE partner_id IS NOT NULL
    """,
)
def contrastive_pair_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive-pair sampling: hash vectors into
    corpus-sized buckets (vec_id mod n/PAIR_BUCKET_ROWS — bucket
    occupancy ~PAIR_BUCKET_ROWS at any corpus size), pair each vector
    with its successor inside the bucket, and label the pair positive
    (same class) or negative, with the exact cosine attached. The
    standard "random pairs without RNG" device for contrastive / triplet
    finetuning data: reproducible under repartitioning and stable when
    the corpus grows only at the modulus boundary.

    Scale shape: one narrow map for the bucket key, one window whose
    partitions hold ~PAIR_BUCKET_ROWS rows (the sort inside each is
    constant-size), one cosine fold per emitted pair. No join."""
    nb = max(1, corpus_n(spark, sf_dir) // PAIR_BUCKET_ROWS)
    b = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", (F.col("vec_id") % nb).alias("bkt")
    )
    w = Window.partitionBy("bkt").orderBy("vec_id")
    p = b.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("ae"),
        F.lead("vec_id").over(w).alias("partner_id"),
        F.lead("label").over(w).alias("partner_label"),
        F.lead("embedding").over(w).alias("pe"),
    )
    pair_type = F.when(
        F.col("anchor_label") == F.col("partner_label"), "positive"
    ).otherwise("negative")
    from lakeview_spark.pipeline.similarity import _norm

    return p.filter(F.col("partner_id").isNotNull()).select(
        "anchor_id",
        "partner_id",
        "anchor_label",
        "partner_label",
        pair_type.alias("pair_type"),
        (_dot("ae", "pe") / (_norm("ae") * _norm("pe"))).alias("cosine"),
    )


@register(
    "contrastive_hard_negatives",
    oracle=f"""
    WITH planes AS ({_PLANES_SQL}),
    bits AS (
      SELECT e.vec_id, e.label, e.embedding, p.plane_id,
             CASE WHEN {_DOT_SQL.format(a="e.embedding", b="p.pe")} > 0 THEN 1 ELSE 0 END AS bit
      FROM embeddings e, planes p
    ),
    bucketed AS (
      SELECT vec_id, any_value(label) AS label, any_value(embedding) AS embedding,
             CAST(sum(bit * (1 << (plane_id - 1))) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    cand AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS negative_id, b.label AS negative_label,
             {_DOT_SQL.format(a="a.embedding", b="b.embedding")}
             / ({_NORM_SQL.format(a="a.embedding")} * {_NORM_SQL.format(a="b.embedding")}) AS cosine
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
       AND a.label <> b.label
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label, cosine,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM (
      SELECT anchor_id, anchor_label, negative_id, negative_label, cosine,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, negative_id) AS rn,
             count(*) OVER (PARTITION BY anchor_id) AS n_candidates
      FROM cand) WHERE rn = 1
    """,
)
def contrastive_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (r10): per anchor
    vector, the HIGHEST-cosine bucket-mate with a DIFFERENT label — the
    near-in-space / wrong-in-class example that contrastive and triplet
    losses learn the most from — plus how many wrong-label candidates
    its bucket held (the mining-depth telemetry). Anchors whose bucket
    holds no wrong-label mate emit nothing (nothing to mine locally —
    the standard in-batch/-bucket mining trade).

    Scale shape: the candidate join is same-bucket only over the
    bucketed LSH scratch (zero-Exchange self-join at scale, the kNN
    graph's join), norms are precomputed parquet columns, and the
    per-anchor argmax is max(struct(cosine, -negative_id, ...)) — a
    PARTIAL-AGGREGABLE aggregation, so each partition collapses its
    candidates map-side; no ranking window touches the pair stream.
    The (cosine DESC, negative_id ASC) total order is the engine-exact
    tiebreak every ranked query here uses."""
    b = _lsh_bucketed(spark, sf_dir)
    a, c = b.alias("a"), b.alias("c")
    cand = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") != F.col("c.vec_id"))
        & (F.col("a.label") != F.col("c.label")),
    ).select(
        F.col("a.vec_id").alias("anchor_id"),
        F.col("a.label").alias("anchor_label"),
        F.col("c.vec_id").alias("negative_id"),
        F.col("c.label").alias("negative_label"),
        (
            _dot("a.embedding", "c.embedding") / (F.col("a.norm") * F.col("c.norm"))
        ).alias("cosine"),
    )
    best = cand.groupBy("anchor_id").agg(
        F.any_value("anchor_label").alias("anchor_label"),
        F.count("*").cast("bigint").alias("n_candidates"),
        F.max(
            F.struct(
                "cosine",
                (-F.col("negative_id")).alias("nk"),
                "negative_id",
                "negative_label",
            )
        ).alias("best"),
    )
    return best.select(
        "anchor_id",
        "anchor_label",
        F.col("best.negative_id").alias("negative_id"),
        F.col("best.negative_label").alias("negative_label"),
        F.col("best.cosine").alias("cosine"),
        "n_candidates",
    )
