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


def test_kmeans_quantized_matches_pure_python_replay(spark):
    """kmeans_train_quantized == an independent pure-Python replay of
    the integer-domain Lloyd's at sf0.001: the oracle proves Spark and
    DuckDB agree, this proves they both compute THE algorithm (quantize
    -> 3x (argmin-assign, floored-integer-mean update) -> report)."""
    import math

    import pyarrow.parquet as pq

    from lakeview_spark.pipeline.iterative import _ITERATIONS, _QUANT

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    vecs = {}
    labels = {}
    for vid, emb, lab in zip(tbl["vec_id"], tbl["embedding"], tbl["label"]):
        # float32 -> python float is the same widening cast both engines do
        vecs[vid] = [math.floor(float(x) * _QUANT) for x in emb]
        labels[vid] = lab
    n = len(vecs)
    k = max(4, min(4096, n // 128))
    centroids = {cid: list(vecs[cid]) for cid in range(1, k + 1)}

    def nearest(qv):
        best = None
        for cid in sorted(centroids):
            d = sum((a - b) * (a - b) for a, b in zip(qv, centroids[cid]))
            if best is None or d < best[1]:
                best = (cid, d)
        return best

    for _ in range(_ITERATIONS):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, qv in vecs.items():
            cid, _d = nearest(qv)
            counts[cid] = counts.get(cid, 0) + 1
            acc = sums.setdefault(cid, [0] * len(qv))
            for i, v in enumerate(qv):
                acc[i] += v
        for cid, acc in sums.items():
            # exact int sums < 2^53: the double division below is the
            # same correctly-rounded value both engines floor
            centroids[cid] = [math.floor(s / counts[cid]) for s in acc]

    expected: dict[int, list] = {}
    for vid, qv in vecs.items():
        cid, d = nearest(qv)
        row = expected.setdefault(cid, [0, set(), None, None])
        row[0] += 1
        row[1].add(labels[vid])
        row[2] = d if row[2] is None else min(row[2], d)
        row[3] = d if row[3] is None else max(row[3], d)

    got = QUERIES["kmeans_train_quantized"](spark, SF_DIR).collect()
    assert len(got) == len(expected)
    for r in got:
        exp = expected[r.cluster_id]
        assert (r.n_vectors, r.n_labels, r.min_sqdist, r.max_sqdist) == (
            exp[0],
            len(exp[1]),
            exp[2],
            exp[3],
        )
