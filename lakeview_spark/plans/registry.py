"""Query registry: every judge-checkable operator registers a Spark
implementation and (when SQL-expressible) a DuckDB oracle.

Contract (driver, __spark_entry__.py): Spark fn (spark, sf_dir) ->
DataFrame; oracle is ANSI SQL over pre-registered views region nation
customer supplier part orders lineitem events documents embeddings.
Column names/aliases MUST match between the two — the driver hashes
values under sorted column names.

Determinism rules used throughout (so value-hashes match bit-for-bit):
- money/measure sums go through DECIMAL(18,2) (exact in both engines),
  cast to DOUBLE only at the end
- divisions happen on identical doubles (exact decimal -> double first)
- every LIMIT carries a total-order ORDER BY tiebreak
- hash-shaped logic uses md5 hex (identical lowercase hex both sides)
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
