"""Scale utilities: skew-aware joins and bucketed co-located joins.

These are the two knobs that matter most at 100 TB beyond what AQE does
automatically:

- `salted_join`: explicit key salting for joins where one side has
  pathological hot keys (AQE's skew-join split handles sort-merge
  stages, but salting is the portable fix when the skewed side must
  aggregate first or the hot key set is known).
- `write_bucketed` / `bucketed_join_ready`: persist both join sides
  bucketed by the join key so repeated joins are shuffle-free (Spark
  bucketing + sortWithinPartitions); the classic fact-to-fact pattern
  (lineitem ⋈ orders at TPC-H scale).
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def spread_unsplittable(df: DataFrame, key: str) -> DataFrame:
    """Input-skew guard (optimization guide §2.5: "one huge
    unsplittable file ... repartition immediately after the read").

    When the scan yields fewer than half the session's parallelism —
    the single-row-group parquet layout Spark cannot split, or one
    giant gzip in production — hash-repartition on ``key`` BEFORE the
    heavy per-row kernel so the kernel runs on every core. ``key``
    must be the downstream aggregation/join key: the exchange then
    *replaces* the one the groupBy would have planned (same key, same
    partition count — §2.4 exchange sharing), so the plan keeps ONE
    exchange; only its position moves from after the kernel (where one
    task pays the whole map) to before it.

    When the scan already parallelizes (many files — the 100 TB
    layout), this is a no-op: shuffling raw rows before a partial
    aggregation would ship strictly more bytes than the aggregated
    form (§2.3 "aggregate before you shuffle"). Key-hash partitioning
    keeps results deterministic — rows group identically either way —
    unlike a round-robin repartition, which would reorder float
    accumulations.

    The partition count is passed EXPLICITLY (defaultParallelism):
    AQE is free to coalesce a count-less keyed repartition back down
    to one task on small inputs — exactly the case the guard exists
    for — while a user-specified count is left alone. Downstream
    aggregations require only ClusteredDistribution on the key, which
    any count satisfies, so the elision argument above is unchanged.

    The parallelism probe is `inputFiles()` + local file sizes, NOT
    `df.rdd.getNumPartitions()`: converting the plan to an RDD costs
    seconds of driver work PER QUERY BUILD (measured 2.5-3.5 s on the
    simhash plan — it re-plans and instantiates the whole Python RDD
    machinery), which dwarfed the win the guard buys. Listing the
    scan's files only needs the analyzed plan's file index (~tens of
    ms), and estimated tasks = ceil(bytes / maxPartitionBytes) summed
    over files is exactly how FilePartition packs splits (modulo the
    4 MB open cost, which only makes our estimate conservative).
    Non-local URIs mean a real object store — the production layout —
    where the no-op is the right call anyway."""
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    try:
        mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except (TypeError, ValueError):
        mpb = 128 * 1024 * 1024
    est_tasks = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            return df
        try:
            size = os.path.getsize(unquote(parsed.path))
        except OSError:
            return df
        est_tasks += max(1, -(-size // mpb))
        if est_tasks * 2 >= p:
            return df
    return df.repartition(p, key)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side exploded
    across salt replicas — distributes a hot key over `salt_buckets`
    tasks instead of one straggler.

    Correctness: join condition (key, salt) with the small side
    replicated for every salt value — row multiplicity identical to the
    plain join.
    """
    salted_big = big.withColumn(
        "_salt", (F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    replicas = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(replicas, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed managed table: co-located, optionally
    sorted, so downstream equi-joins on `key` skip the shuffle."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables — Catalyst detects matching
    bucketing and plans a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key)
