"""Ad-hoc r12 measurement: composed / refined recall@10 vs nprobe at a
given SF dir (default scratch/sf1, k=156) — the grid behind the
scale-adaptive nprobe constant (_IVFPQ_NPROBE_FRAC) and the exact-rerank
refinement stage. Mirrors eval_ivfpq_nprobe_sweep's one-pass crank
device but tags candidates with their cluster rank over ALL k clusters
so one ADC pass serves arbitrary nprobe grid points, and additionally
reranks each (np, probe) ADC top-_REFINE_C shortlist by exact quantized
distance (the refine path). Usage:

    python scripts/nprobe_grid_sf1.py [sf_dir] [np1 np2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from lakeview_spark import get_spark  # noqa: E402
from lakeview_spark.pipeline.iterative import _kq_sqdist  # noqa: E402
from lakeview_spark.pipeline.similarity import (  # noqa: E402
    _PQ_M,
    _PQ_PROBE_TARGET,
    _PQ_RECALL_TOP,
    _PQ_SUB,
    _ivfpq_coarse_parts,
    _pq_emb,
    corpus_n,
    pq_codebook_df,
    pq_codes_materialized,
)

REFINE_C = 4 * _PQ_RECALL_TOP  # exact-rerank shortlist size


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scratch/sf1"
    grid = [int(a) for a in sys.argv[2:]] or [3, 5, 10, 20, 39, 78, 156]

    spark = get_spark("nprobe-grid", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    n = corpus_n(spark, sf_dir)
    stride = max(1, n // _PQ_PROBE_TARGET)
    emb = _pq_emb(spark, sf_dir)
    cents, coarse = _ivfpq_coarse_parts(spark, sf_dir, emb)
    probes = emb.filter((F.col("vec_id") % stride) == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )

    # exact quantized truth
    wt = W.partitionBy("probe_id").orderBy("full_dist", "vec_id")
    truth = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", _kq_sqdist("qv", "pqv").alias("full_dist"))
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _PQ_RECALL_TOP)
        .select(F.col("probe_id").alias("t_probe"), F.col("vec_id").alias("t_vec"))
    )

    # per-probe cluster ranks over ALL k clusters (no nprobe cut)
    wc = W.partitionBy("probe_id").orderBy("cdist", "cluster_id")
    pclusters = (
        probes.crossJoin(F.broadcast(cents))
        .select("probe_id", "cluster_id", _kq_sqdist("pqv", "cv").alias("cdist"))
        .withColumn("crank", F.row_number().over(wc))
        .select("probe_id", F.col("cluster_id").alias("pcluster"), "crank")
    )
    psubs = (
        probes.join(pclusters, "probe_id")
        .select(
            "probe_id",
            "pcluster",
            "crank",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_PQ_M - 1}), "
                    f"m -> struct(m AS m, slice(pqv, m * {_PQ_SUB} + 1, {_PQ_SUB}) AS sv))"
                )
            ).alias("s"),
        )
        .select("probe_id", "pcluster", "crank", F.col("s.m").alias("pm"), F.col("s.sv").alias("sv"))
    )
    codebook = pq_codebook_df(spark, sf_dir)
    adc = (
        pq_codes_materialized(spark, sf_dir)
        .select("vec_id", "m", "codeword")
        .join(coarse, "vec_id")
        .join(F.broadcast(codebook), ["m", "codeword"])
        .join(
            F.broadcast(psubs),
            (F.col("m") == F.col("pm")) & (F.col("cluster_id") == F.col("pcluster")),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", "crank", _kq_sqdist("sv", "cv").alias("part"))
        .groupBy("probe_id", "vec_id")
        .agg(
            F.min("crank").cast("bigint").alias("crank"),
            F.sum("part").cast("bigint").alias("adc_dist"),
        )
    ).localCheckpoint()

    exact = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", _kq_sqdist("qv", "pqv").alias("exact_dist"))
    ).localCheckpoint()

    n_probes = probes.count()
    print(f"sf_dir={sf_dir} n={n} k={cents.count()} probes={n_probes} C={REFINE_C}")
    for np_ in grid:
        cand = adc.filter(F.col("crank") <= np_)
        wr = W.partitionBy("probe_id").orderBy("adc_dist", "vec_id")
        composed = (
            cand.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= _PQ_RECALL_TOP)
            .select("probe_id", "vec_id")
        )
        shortlist = (
            cand.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= REFINE_C)
            .select("probe_id", "vec_id")
        )
        we = W.partitionBy("probe_id").orderBy("exact_dist", "vec_id")
        refined = (
            shortlist.join(exact, ["probe_id", "vec_id"])
            .withColumn("rn", F.row_number().over(we))
            .filter(F.col("rn") <= _PQ_RECALL_TOP)
            .select("probe_id", "vec_id")
        )

        def recall(top):
            hits = top.join(
                truth,
                (F.col("probe_id") == F.col("t_probe"))
                & (F.col("vec_id") == F.col("t_vec")),
            ).count()
            return hits / (n_probes * _PQ_RECALL_TOP)

        n_cand = cand.count()
        print(
            f"np={np_:4d} frac={np_ / cents.count():.3f} cand/probe={n_cand / n_probes:8.1f} "
            f"composed={recall(composed):.3f} refined={recall(refined):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
