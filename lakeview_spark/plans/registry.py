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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


def events_ts_us(df: DataFrame, col: str = "ts") -> Column:
    """Event-time of ``col`` as integer microseconds since the epoch,
    whatever the parquet writer chose as the physical type.

    The engine must not hard-code a wire type it didn't write (the
    reference reads foreign metadata the same way): events.ts has
    shipped both as TIMESTAMP(NANOS) — which Spark, having no nanos
    type, surfaces as BIGINT nanos under
    spark.sql.legacy.parquet.nanosAsLong=true — and as
    TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ. Dispatch on the
    observed dtype:

      bigint      -> nanos: integer div to micros
      timestamp*  -> unix_micros after a cast that is exact under the
                     session's UTC timezone (TIMESTAMP_NTZ -> TIMESTAMP
                     is the identity at UTC, session.py pins it)

    Both branches equal DuckDB's ``epoch_us(ts)`` bit-for-bit, so the
    oracles never change.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return F.expr(f"{col} div 1000")
    if dt is not None and dt.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise TypeError(
        f"events.{col} has unsupported dtype {dt!r}: expected bigint "
        "(nanos) or a timestamp type — did the testdata schema drift? "
        "(see tests/test_testdata_schema.py)"
    )
