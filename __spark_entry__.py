"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries()/oracle_sql()
expose the full registered inventory (lakeview_spark.plans registry) for
the driver's DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    # driver may hand us a vanilla session; apply the engine's read conf
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lakeview_spark.plans import QUERIES

    _configure(spark)
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in the
    explicit driver-window order (first 50 = the round's correctness
    window; see plans/__init__.py)."""
    from lakeview_spark.plans import QUERIES, ensure_driver_order

    ensure_driver_order()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; queries
    without an entry get the driver's weaker rows-only check."""
    from lakeview_spark.plans import ORACLES, ensure_driver_order

    ensure_driver_order()
    return dict(ORACLES)
