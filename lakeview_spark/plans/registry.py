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


# (application id, dataset dir, table, stat fingerprint) -> source
# DataFrame. Plan-node memoization, NOT data caching:
# `spark.read.parquet` costs ~200 ms of driver work per call (py4j
# round-trips + DataSource resolution + footer schema read), and a
# 6-table star query paid it six times per BUILD — 1.3 s of the
# bench's per-query wall before any task ran (r14 optimization;
# cProfile evidence in OPTIMIZATION_r14.md). DataFrames are immutable,
# so handing every caller the same scan node changes no plan semantics
# and caches no rows; keying on application id drops the memo with the
# session, the same bound as the materialize/codebook caches. The scan
# captures its file listing at READ time, so the key also carries the
# path's stat fingerprint (mtime_ns + size): a rewritten or appended
# dataset misses the memo and re-lists instead of serving a stale
# FileIndex (the cache-freshness tests rewrite datasets in place).
_TABLES: dict[tuple[str, str, str, str], DataFrame] = {}


def _path_stat(path: str) -> str:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return "missing"
    return f"{st.st_mtime_ns}:{st.st_size}"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, sf_dir, name, _path_stat(path))
    df = _TABLES.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _TABLES[key] = df
    return df


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
