"""Micro-benchmark: interpreted zip_with/aggregate distance fold vs an
unrolled fixed-dim codegen expression, on the real quantized corpus at
the given SF — the measurement behind the r14 kernel decision
(OPTIMIZATION_r14.md). Times each variant with the noop sink (guide
§1.4) over a probes x corpus exact-distance scan.

Usage: python scripts/kernel_probe.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def unrolled_sqdist(a: str, b: str, dim: int):
    terms = None
    for i in range(1, dim + 1):
        d = F.element_at(F.col(a), i) - F.element_at(F.col(b), i)
        t_ = d * d
        terms = t_ if terms is None else terms + t_
    return terms


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from lakeview_spark.pipeline.iterative import _kq_sqdist
    from lakeview_spark.pipeline.similarity import _pq_emb, _PQ_PROBE_TARGET, corpus_n
    from lakeview_spark.session import get_spark

    spark = get_spark("kernel-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    n = corpus_n(spark, sf_dir)
    stride = max(1, n // _PQ_PROBE_TARGET)
    emb = _pq_emb(spark, sf_dir)
    probes = emb.filter((F.col("vec_id") % stride) == 0).select(
        F.col("vec_id").alias("probe_id"), F.col("qv").alias("pqv")
    )

    def run(label, dist_col):
        df = (
            emb.crossJoin(F.broadcast(probes))
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select("probe_id", "vec_id", dist_col.alias("dist"))
        )
        for i in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(f"{label} rep{i}: {time.time() - t0:.3f}s", flush=True)

    # checksum parity first: both kernels must agree exactly
    a = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            F.sum(_kq_sqdist("qv", "pqv")).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()[0]
    )
    b = (
        emb.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            F.sum(unrolled_sqdist("qv", "pqv", 64)).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()[0]
    )
    print(f"fold checksum {a.s}/{a.c}  unrolled checksum {b.s}/{b.c}", flush=True)
    assert (a.s, a.c) == (b.s, b.c), "kernel mismatch"

    run("fold", _kq_sqdist("qv", "pqv"))
    run("unrolled", unrolled_sqdist("qv", "pqv", 64))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
