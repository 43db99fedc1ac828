"""Instant-filename parsing as pure columnar expressions (SURVEY §2.2 P1-P3).

Semantics mirror ActiveTimelineInstantBatcher.getActiveTimeLineInstant
(reference ActiveTimelineInstantBatcher.java:267-297):

- split(filename, '.', limit=3); token0 is the timestamp token
- V9 / Hudi 1.x completed instants embed a completion time after '_'
  in token0 ("20260204053206256_20260204053210895.deltacommit")
- "X.inflight" (2 tokens, token1 == 'inflight') => action=commit,
  state=inflight (commit-action inflight files have no action token)
- 2 tokens otherwise => action=token1, state=completed
- 3 tokens => action=token1, state=token2

All expressions are JVM-side columnar (split/when/cast) — no UDFs, so
Catalyst keeps them inside whole-stage codegen and can push the
whitelist filter to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeview_spark.constants import (
    HOODIE_PROPERTIES_FILE,
    WHITELISTED_ACTION_TYPES,
)


def _parts(filename: Column) -> Column:
    # Java String.split("\\.", 3): at most 3 tokens, remainder kept in last
    return F.split(filename, r"\.", 3)


def ts_str_col(filename: Column) -> Column:
    """Leading numeric token, pre-underscore (the request timestamp)."""
    tok0 = _parts(filename)[0]
    return F.split(tok0, "_", 2)[0]


def completion_ts_col(filename: Column) -> Column:
    """V9 completion timestamp (post-underscore), NULL for V1-V8 names."""
    tok0 = _parts(filename)[0]
    return F.when(tok0.contains("_"), F.split(tok0, "_", 2)[1])


def action_col(filename: Column) -> Column:
    parts = _parts(filename)
    return F.when(
        (F.size(parts) == 2) & (parts[1] == F.lit("inflight")), F.lit("commit")
    ).otherwise(parts[1])


def state_col(filename: Column) -> Column:
    parts = _parts(filename)
    return (
        F.when((F.size(parts) == 2) & (parts[1] == F.lit("inflight")), F.lit("inflight"))
        .when(F.size(parts) == 3, parts[2])
        .otherwise(F.lit("completed"))
    )


def parse_instants(df: DataFrame, filename: str = "filename") -> DataFrame:
    """files DF -> instants DF: adds ts, ts_str, completion_ts, action, state.

    ts is DECIMAL(38,0) — reference compares commit ids as BigDecimal
    (TimelineCommitInstantsUploader.java:940-946); 17+-digit V9 ids
    overflow LONG.
    """
    fn = F.col(filename)
    return (
        df.withColumn("ts_str", ts_str_col(fn))
        # try_cast: non-instant names (hoodie.properties) yield NULL instead
        # of an ANSI cast error under Spark 4's default ANSI mode
        .withColumn("ts", F.col("ts_str").try_cast("decimal(38,0)"))
        .withColumn("completion_ts", completion_ts_col(fn))
        .withColumn("action", action_col(fn))
        .withColumn("state", state_col(fn))
    )


def whitelist_filter(df: DataFrame, filename: str = "filename", keep_properties: bool = True) -> DataFrame:
    """Keep whitelisted actions (ActiveTimelineInstantBatcher.java:220-224).

    hoodie.properties passes the filter in the reference (filterFile).
    """
    fn = F.col(filename)
    cond = action_col(fn).isin(*WHITELISTED_ACTION_TYPES)
    if keep_properties:
        cond = cond | (fn == F.lit(HOODIE_PROPERTIES_FILE))
    return df.filter(cond)
