"""Synthesize an organic ~sf1 dataset (10x sf0.1) for the BASELINE.md
scaling run (r7 verdict next-6): the 10x/100x dedup probes used
single-table replicas; this builds the WHOLE star schema at 10x so the
headline bench can run unmodified at the next scale factor.

Usage: python scripts/make_sf1.py [base_sf_dir] [out_dir] [n_replicas]
Defaults: /root/testdata/sf0.1 -> ./scratch/sf1, 10 replicas.

Replica technique (SCALE.md §8, applied schema-wide so referential
joins, selectivities, and distribution shapes all match the base
corpus instead of degenerating):

- region/nation: fixed-size dimensions, copied as-is (TPC-H holds them
  constant across scale factors).
- customer/supplier/part/orders/lineitem: every key column is offset
  by replica * (max_key + 1) — each replica is a self-contained copy
  of the star, so every join keeps its base-corpus fan-out and the
  date/price/flag distributions are untouched.
- events: event_id/user_id offset, ts and value kept — 10x event
  density over the same time span (what 10x traffic looks like);
  per-user histories replicate rather than concatenate, so
  sessionization/retention state stays per-user-bounded.
- documents: doc_id offset and every token suffixed with the replica
  ordinal (shingle-disjoint replicas — the near-dup pair structure
  mirrors the base corpus per replica; near-identical replicas would
  instead grow pairs quadratically, the §8 caveat). n_chars is
  recomputed from the suffixed text.
- embeddings: vec_id offset and a per-replica SIGNED PERMUTATION of
  the coordinates (circular shift by replica, sign flip where
  (i + replica) is odd) — orthogonal, so intra-replica norms/dots (and
  thus every per-replica similarity result) are preserved while
  cross-replica cosines decorrelate.

Every table is written as a DIRECTORY of parquet part files (8 for the
fact/corpus tables) — the splittable multi-file layout a real
deployment scans, which the single-file driver testdata cannot give
(SCALE.md §6). events.ts round-trips as TIMESTAMP(MICROS), one of the
two physical types the engine's events_ts_us dispatch supports.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _replicate(
    df: DataFrame, n: int, offsets: dict[str, int], transform=None
) -> DataFrame:
    """Union n copies with each key column in `offsets` shifted by
    replica * offset; `transform(df, r)` applies per-replica rewrites."""
    parts = []
    for r in range(n):
        part = df
        for col, off in offsets.items():
            part = part.withColumn(col, F.col(col) + F.lit(r * off))
        if transform is not None:
            part = transform(part, r)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _max_plus_one(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def main() -> int:
    from lakeview_spark import get_spark

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scratch", "sf1"
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    read = lambda t: spark.read.parquet(f"{base}/{t}.parquet")  # noqa: E731

    cust_off = _max_plus_one(read("customer"), "c_custkey")
    supp_off = _max_plus_one(read("supplier"), "s_suppkey")
    part_off = _max_plus_one(read("part"), "p_partkey")
    order_off = _max_plus_one(read("orders"), "o_orderkey")
    user_off = _max_plus_one(read("events"), "user_id")
    event_off = _max_plus_one(read("events"), "event_id")
    doc_off = _max_plus_one(read("documents"), "doc_id")
    vec_off = _max_plus_one(read("embeddings"), "vec_id")

    def doc_text(df: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return df
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda tok: F.concat(tok, F.lit(f"_r{r}")),
            ),
            " ",
        )
        return df.withColumn("text", suffixed).withColumn(
            "n_chars", F.length("text")
        )

    def emb_rotate(df: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return df
        dim = F.size("embedding")
        shift = F.lit(r) % dim
        shifted = F.concat(
            F.slice(F.col("embedding"), shift + 1, dim - shift),
            F.slice(F.col("embedding"), 1, shift),
        )
        signed = F.zip_with(
            shifted,
            F.sequence(F.lit(0), dim - 1),
            lambda x, i: F.when((i + F.lit(r)) % 2 == 1, -x).otherwise(x),
        )
        return df.withColumn("embedding", signed.cast("array<float>"))

    plans = {
        "region": (read("region"), {}, None, 1),
        "nation": (read("nation"), {}, None, 1),
        "customer": (read("customer"), {"c_custkey": cust_off}, None, 4),
        "supplier": (read("supplier"), {"s_suppkey": supp_off}, None, 4),
        "part": (read("part"), {"p_partkey": part_off}, None, 4),
        "orders": (
            read("orders"),
            {"o_orderkey": order_off, "o_custkey": cust_off},
            None,
            8,
        ),
        "lineitem": (
            read("lineitem"),
            {"l_orderkey": order_off, "l_partkey": part_off, "l_suppkey": supp_off},
            None,
            8,
        ),
        "events": (
            read("events"),
            {"event_id": event_off, "user_id": user_off},
            None,
            8,
        ),
        "documents": (read("documents"), {"doc_id": doc_off}, doc_text, 8),
        "embeddings": (read("embeddings"), {"vec_id": vec_off}, emb_rotate, 8),
    }

    os.makedirs(out, exist_ok=True)
    for name, (df, offsets, tf, files) in plans.items():
        rep = df if not offsets and tf is None else _replicate(df, n, offsets, tf)
        rep.repartition(files).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
