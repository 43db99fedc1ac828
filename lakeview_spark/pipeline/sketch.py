"""Sketch-based approximate statistics over the documents corpus.

At 100 TB you cannot afford exact distinct counts over token-level
columns in every report; sketches are how a training-data pipeline does
cardinality at scale. Spark's built-in approx_count_distinct (HLL++) is
the production tool but is NOT cross-engine reproducible, so the
oracle-checkable variant here is a KMV (k-minimum-values) sketch built
on md5: fully deterministic, identical in any engine, and with the same
"one pass + tiny state" scale shape as HLL.

Estimator (Bar-Yossef et al. 2002, standard KMV): hash every distinct
element to (0, 2^60); if v_k is the k-th smallest distinct hash value,
D ~= (k-1) * 2^60 / v_k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.plans.registry import register, t

K = 256
HASH_SPACE = float(1 << 60)  # md5 prefix of 15 hex digits

# fold 15 hex chars -> exact bigint, identically in both engines
_HEX_FOLD_SQL = (
    "list_reduce(list_transform(range(1, 16), i -> "
    "CAST(strpos('0123456789abcdef', substr(md5(token), i, 1)) - 1 AS BIGINT)), "
    "(acc, x) -> acc * 16 + x)"
)


@register(
    "corpus_distinct_kmv",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ),
    hashed AS (SELECT DISTINCT {_HEX_FOLD_SQL} AS hv FROM tok),
    kmin AS (SELECT hv FROM hashed ORDER BY hv LIMIT {K})
    SELECT CAST(count(*) AS BIGINT) AS k_actual,
           max(hv) AS kth_hash,
           CAST(count(*) - 1 AS DOUBLE) * {HASH_SPACE!r} / max(hv) AS est_distinct,
           (SELECT count(*) FROM tok) AS exact_distinct
    FROM kmin
    """,
)
def corpus_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-token estimate next to the exact count.

    Scale shape: the k smallest hashes come from TakeOrderedAndProject
    (per-partition top-k, tiny merge at the driver) over a map-side
    partially-aggregated distinct — state is K values per partition, the
    exact same footprint HLL would keep. The exact count alongside is
    the accuracy check (and is itself one distinct shuffle).
    """
    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .distinct()
    )
    # conv() parses the same 15-hex prefix the oracle folds — exact bigint
    hashed = toks.select(
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint").alias("hv")
    ).distinct()
    kmin = hashed.orderBy("hv").limit(K)
    exact = toks.agg(F.count("*").cast("bigint").alias("exact_distinct"))
    return kmin.agg(
        F.count("*").cast("bigint").alias("k_actual"),
        F.max("hv").alias("kth_hash"),
        (
            (F.count("*") - 1).cast("double") * F.lit(HASH_SPACE) / F.max("hv")
        ).alias("est_distinct"),
    ).crossJoin(F.broadcast(exact))
