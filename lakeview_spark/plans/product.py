"""Product-surface queries matching the reference UI claims verbatim
(README.md:299-344): searchable timeline history with pagination, and a
per-table health summary (the table-detail dashboard header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeview_spark.plans.analytics import _TF_SQL, _PARSE_SQL_BODY, _timeline_files
from lakeview_spark.functions.instants import parse_instants
from lakeview_spark.plans.registry import register, t


@register(
    "timeline_search",
    oracle=f"""
    WITH tf AS ({_TF_SQL}), inst AS ({_PARSE_SQL_BODY})
    SELECT filename, ts_str, action, state, page_rank FROM (
      SELECT filename, ts_str, action, state,
             row_number() OVER (ORDER BY CAST(ts_str AS BIGINT) DESC, filename) AS page_rank
      FROM inst
      WHERE state = 'completed' AND action IN ('commit', 'deltacommit')
        AND CAST(ts_str AS BIGINT) BETWEEN 5000 AND 20000
    ) WHERE page_rank <= 50
    """,
)
def timeline_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searchable ordered timeline (README.md:309-319): filter by
    action/state/commit-id range, newest first, first page of 50.
    Filters are columnar predicates ahead of the ranking, and the page
    itself is fetched with orderBy().limit(50) — Spark plans that as
    TakeOrderedAndProject (per-partition top-50 + driver merge), never a
    global single-task sort. Ranking runs afterwards over just the 50
    returned rows, so the window cost is constant regardless of scale."""
    inst = parse_instants(_timeline_files(spark, sf_dir))
    page = (
        inst.filter(
            (F.col("state") == "completed")
            & F.col("action").isin("commit", "deltacommit")
            & F.col("ts_str").cast("bigint").between(5000, 20000)
        )
        .orderBy(F.col("ts_str").cast("bigint").desc(), "filename")
        .limit(50)
    )
    w = Window.orderBy(F.col("ts_str").cast("bigint").desc(), "filename")
    return page.withColumn("page_rank", F.row_number().over(w)).select(
        "filename", "ts_str", "action", "state", "page_rank"
    )


@register(
    "table_health_summary",
    oracle=f"""
    WITH tf AS ({_TF_SQL}), inst AS ({_PARSE_SQL_BODY}),
    joined AS (
      SELECT i.*, o.o_custkey % 5 AS table_num
      FROM inst i JOIN orders o ON i.ts_str = CAST(o.o_orderkey AS VARCHAR)
    ),
    g AS (
      SELECT table_num, ts_str,
             (bool_or(state = 'requested') AND bool_or(state = 'inflight')
              AND bool_or(state = 'completed')) AS is_complete
      FROM joined GROUP BY table_num, ts_str
    )
    SELECT table_num,
           count(*) AS total_commits,
           count(CASE WHEN is_complete THEN 1 END) AS complete_commits,
           count(CASE WHEN NOT is_complete THEN 1 END) AS incomplete_commits,
           max(CASE WHEN is_complete THEN CAST(ts_str AS BIGINT) END) AS last_complete_commit,
           CAST(min(CASE WHEN NOT is_complete THEN CAST(ts_str AS BIGINT) END) AS BIGINT) AS first_incomplete_commit
    FROM g GROUP BY table_num
    """,
)
def table_health_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table health header: commit totals, completeness split, last
    complete commit and first incomplete — the numbers the table-detail
    page shows above the timeline (README.md:299-330)."""
    inst = parse_instants(_timeline_files(spark, sf_dir))
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("ts_str"),
        (F.col("o_custkey") % 5).alias("table_num"),
    )
    g = (
        inst.join(o, "ts_str")
        .groupBy("table_num", "ts_str")
        .agg(
            (
                F.bool_or(F.col("state") == "requested")
                & F.bool_or(F.col("state") == "inflight")
                & F.bool_or(F.col("state") == "completed")
            ).alias("is_complete")
        )
    )
    return g.groupBy("table_num").agg(
        F.count("*").alias("total_commits"),
        F.count(F.when(F.col("is_complete"), 1)).alias("complete_commits"),
        F.count(F.when(~F.col("is_complete"), 1)).alias("incomplete_commits"),
        F.max(F.when(F.col("is_complete"), F.col("ts_str").cast("bigint"))).alias(
            "last_complete_commit"
        ),
        F.min(F.when(~F.col("is_complete"), F.col("ts_str").cast("bigint")))
        .cast("bigint")
        .alias("first_incomplete_commit"),
    )
