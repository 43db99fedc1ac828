"""Additional star-schema query shapes (J7 breadth): TPC-H Q6/Q10/Q12/Q14
analogs over the testdata star, plus event sessionization (gap-based
session windows via lag + running sum — the W4 family's heavyweight).

Same determinism rules as analytics.py: DECIMAL-exact sums cast to
double at the edge, integer micros for event time, total-order
tiebreaks on every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeview_spark.plans.analytics import _dec
from lakeview_spark.plans.registry import events_ts_us, register, t


@register(
    "forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
           count(*) AS qualifying_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive pushdown filters + one agg
    — the query whose plan should be a single codegen'd scan stage."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2).cast("double").alias("revenue"),
        F.count("*").alias("qualifying_lineitems"),
    )


@register(
    "returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item losers, top-20 by revenue."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "priority_by_orderpriority",
    oracle="""
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled,
           count(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS open_or_partial,
           count(*) AS total
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY o_orderpriority
    """,
)
def priority_by_orderpriority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipping-lag counts split by status per priority."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("fulfilled"),
        F.count(F.when(F.col("o_orderstatus") != "F", 1)).alias("open_or_partial"),
        F.count("*").alias("total"),
    )


@register(
    "brand_revenue_share",
    oracle="""
    SELECT p_brand,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS brand_revenue,
           count(*) AS lineitems
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 family: revenue by part brand (fact ⋈ broadcast part dim)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("brand_revenue"),
            F.count("*").alias("lineitems"),
        )
    )


@register(
    "events_sessionization",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       > 1800000000 OR lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ), sessions AS (
      SELECT user_id, ts_us,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS events,
           min(ts_us) AS session_start_us,
           max(ts_us) - min(ts_us) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min idle gap): lag -> new-session
    flag -> running sum = session id. The classic event-stream window
    chain; partitioned per user so state is bounded."""
    ev = t(spark, sf_dir, "events")
    e = ev.select("user_id", events_ts_us(ev).alias("ts_us"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    prev = F.lag("ts_us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > 1800000000), 1).otherwise(0),
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("events"),
        F.min("ts_us").alias("session_start_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers-per-order-count histogram. The LEFT
    OUTER join keeps zero-order customers (count(o_orderkey) skips the
    null rows), then a second partial-aggregable count collapses the
    distribution — two shuffles total, both on small keys."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the max quarterly revenue.
    The revenue CTE aggregates once; the max is a 1-row broadcast joined
    back (scalar-subquery equality) — exact because revenue stays
    DECIMAL(18,2) until the output edge, so ties resolve identically in
    both engines."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_max_rev"))
    s = t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "brand_supplier_breadth",
    oracle="""
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 2, 3, 4, 5)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    """,
)
def brand_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier breadth per (brand, size),
    excluding blacklisted suppliers via an anti join (the NOT IN
    subquery becomes a broadcast left-anti — no null-semantics trap
    because s_suppkey is non-null by construction)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 2, 3, 4, 5))
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_ASOF_ORDER = (
    "PARTITION BY user_id ORDER BY ts_us, is_click, event_id "
    "ROWS UNBOUNDED PRECEDING"
)


@register(
    "events_asof_click_value",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      FROM events
    ), w AS (
      SELECT event_id, user_id, ts_us, event_type, value,
             last_value(CASE WHEN is_click = 1 THEN value END IGNORE NULLS)
               OVER ({_ASOF_ORDER}) AS last_click_value,
             last_value(CASE WHEN is_click = 1 THEN ts_us END IGNORE NULLS)
               OVER ({_ASOF_ORDER}) AS last_click_ts_us
      FROM e
    )
    SELECT event_id, user_id, ts_us, value AS purchase_value,
           last_click_value, last_click_ts_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def events_asof_click_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, composed from Spark primitives: each purchase event
    picks up the most recent strictly-prior click's value per user.

    Spark has no ASOF JOIN operator; the scalable reformulation is the
    union-and-carry trick — one partitioned window over the merged
    event stream with last(..., ignorenulls) carrying click state
    forward. Strictness at equal timestamps comes from the sort key
    (ts_us, is_click, event_id): clicks sort AFTER purchases at the
    same ts_us, so a purchase never sees a same-instant click; the
    event_id tiebreak makes same-ts click ordering total. One shuffle
    on user_id, state bounded per user — the 100 TB shape (a
    range/broadcast join would be quadratic per hot user)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        events_ts_us(ev).alias("ts_us"),
        "event_type",
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_click", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_val = F.when(F.col("is_click") == 1, F.col("value"))
    click_ts = F.when(F.col("is_click") == 1, F.col("ts_us"))
    carried = e.select(
        "event_id",
        "user_id",
        "ts_us",
        "event_type",
        "value",
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_value"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts_us"),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("value").alias("purchase_value"),
        "last_click_value",
        "last_click_ts_us",
    )


@register(
    "events_props_json_stats",
    oracle="""
    WITH e AS (
      SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    )
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
           min(k) AS min_k, max(k) AS max_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(k) AS DOUBLE) / sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS avg_k
    FROM e GROUP BY event_type
    """,
)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured scalar path: pull a typed field out of the JSON
    props column (get_json_object stays JVM-side, no UDF) and aggregate
    per event type. Integer sums stay exact; the mean is one double
    division at the edge. try_cast guards malformed payloads under ANSI
    mode."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("try_cast(get_json_object(props, '$.k') AS int)").alias("k"),
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        (
            F.sum("k").cast("double")
            / F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        ).alias("avg_k"),
    )


@register(
    "events_sliding_window_stats",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
    )
    SELECT event_id, user_id, ts_us,
           CAST(count(*) OVER w AS BIGINT) AS events_last_hour,
           max(value) OVER w AS max_value_last_hour,
           ts_us - min(ts_us) OVER w AS span_us
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def events_sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour per-user activity via a RANGE window frame (the
    one frame kind the reference never needs — W4 breadth): for each
    event, how many events, the max value, and the time span within the
    preceding hour.

    Frame membership is by ts_us VALUE, so equal-timestamp rows share
    identical frames in both engines — no ordering ambiguity. Only
    order-independent aggregates (count, max, min) ride on the frame;
    no float summation. Partitioned per user: bounded state, no global
    sort, the 100x-safe shape."""
    ev = t(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", events_ts_us(ev).alias("ts_us"), "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).cast("bigint").alias("events_last_hour"),
        F.max("value").over(w).alias("max_value_last_hour"),
        (F.col("ts_us") - F.min("ts_us").over(w)).alias("span_us"),
    )


@register(
    "events_user_retention",
    oracle="""
    WITH w AS (
      SELECT DISTINCT user_id,
             CAST((epoch_us(ts) // 604800000000) AS BIGINT) AS week
      FROM events
    )
    SELECT a.week,
           count(*) AS active_users,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained_next_week,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS retention_rate
    FROM w a LEFT JOIN w b ON a.user_id = b.user_id AND b.week = a.week + 1
    GROUP BY a.week
    """,
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week user retention: of the users active in week w,
    how many are also active in week w+1. Distinct (user, week) grid
    then a self left-join shifted one week — both shuffles key on
    user_id, cohort sizes are exact integers, the rate is one edge
    division. The classic product-analytics cohort query (W4 family)."""
    e = t(spark, sf_dir, "events")
    w = (
        e.select("user_id", events_ts_us(e).alias("ts_us"))
        .select(
            "user_id",
            F.expr("CAST(ts_us div 604800000000 AS BIGINT)").alias("week"),
        )
        .distinct()
    )
    a, b = w.alias("a"), w.alias("b")
    j = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.week") == F.col("a.week") + 1),
        "left",
    )
    return j.groupBy(F.col("a.week").alias("week")).agg(
        F.count("*").alias("active_users"),
        F.sum(F.when(F.col("b.user_id").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("retained_next_week"),
        (
            F.sum(F.when(F.col("b.user_id").isNotNull(), 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("retention_rate"),
    )


@register(
    "events_click_attribution",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
    ),
    clicks AS (SELECT user_id, event_id AS click_id, ts_us AS click_ts FROM e WHERE event_type = 'click'),
    purchases AS (SELECT user_id, event_id AS purchase_id, ts_us AS purchase_ts, value FROM e WHERE event_type = 'purchase')
    SELECT p.user_id, p.purchase_id, c.click_id,
           p.purchase_ts - c.click_ts AS lag_us, p.value AS purchase_value
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND c.click_ts < p.purchase_ts
     AND c.click_ts >= p.purchase_ts - 3600000000
    """,
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window interval join: every (click, purchase) pair
    for the same user where the click lands strictly within the hour
    before the purchase — the classic marketing-attribution shape, and
    the bounded-interval join family (vs the as-of join's latest-only
    semantics).

    Executes as an equi join on user_id with the range predicate as a
    post-join filter inside sort-merge — per-user state only, and the
    1-hour bound caps pairs per user at (clicks-per-hour x purchases),
    never the unbounded cross product. Pure integer time math."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        events_ts_us(ev).alias("ts_us"),
        "event_type",
        "value",
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_us").alias("purchase_ts"),
        "value",
    )
    j = purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - 3_600_000_000),
    )
    return j.select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        (F.col("purchase_ts") - F.col("click_ts")).alias("lag_us"),
        F.col("value").alias("purchase_value"),
    )


@register(
    "events_user_value_quartiles",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, value FROM events
    ),
    q AS (
      SELECT user_id, value,
             ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS quartile
      FROM e
    )
    SELECT user_id, CAST(quartile AS BIGINT) AS quartile, count(*) AS n_events,
           min(value) AS min_value, max(value) AS max_value
    FROM q GROUP BY user_id, quartile
    """,
)
def events_user_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value quartiles via ntile — the remaining ranking-family
    window function (row_number/rank/dense_rank/lag/lead/last already
    exercised elsewhere). The (value, event_id) total order makes the
    bucket assignment engine-deterministic even with duplicate values;
    partitioning by user keeps window state bounded per user (never a
    global sort), and the aggregates are count/min/max only."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    q = e.withColumn("quartile", F.ntile(4).over(w).cast("bigint"))
    return q.groupBy("user_id", "quartile").agg(
        F.count("*").alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "events_rollup_cascade",
    oracle="""
    WITH e AS (SELECT epoch_us(ts) AS ts_us, value FROM events)
    SELECT ts_us // 86400000000 AS day_bucket,
           count(*) AS events,
           min(value) AS min_value,
           max(value) AS max_value
    FROM e GROUP BY day_bucket
    """,
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: minute rollup from
    raw events, hourly rollup FROM the minute level, daily FROM hourly —
    each level re-aggregates the one below (counts sum; min/max of
    min/max), never the raw table. The oracle is the direct daily
    aggregate, so the driver hash proves cascade == direct — the
    algebraic-reaggregation property that makes multi-resolution
    continuous aggregates valid at all.

    Scale shape: this is how a 100 TB event store serves dashboards —
    raw -> minute is the only scan of the big table; every coarser
    resolution aggregates the (tiny) previous level. Only
    order-independent aggregates (count/min/max) cascade here;
    float sums would need exact decimal carriers (CLAUDE.md rule)."""
    ev = t(spark, sf_dir, "events")
    minute = (
        ev.select(events_ts_us(ev).alias("ts_us"), "value")
        .withColumn("minute_bucket", F.expr("ts_us div 60000000"))
        .groupBy("minute_bucket")
        .agg(
            F.count("*").alias("events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    hour = (
        minute.withColumn("hour_bucket", F.expr("minute_bucket div 60"))
        .groupBy("hour_bucket")
        .agg(
            F.sum("events").alias("events"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return (
        hour.withColumn("day_bucket", F.expr("hour_bucket div 24"))
        .groupBy("day_bucket")
        .agg(
            F.sum("events").cast("bigint").alias("events"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
    v AS (SELECT user_id, min(ts_us) AS view_ts
          FROM e WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts_us) AS click_ts
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts_us > v.view_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts_us) AS purchase_ts
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts_us > c.click_ts
          GROUP BY e.user_id)
    SELECT CAST(v.view_ts // 604800000000 AS BIGINT) AS cohort_week,
           count(*) AS n_viewers,
           CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clicked,
           CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchased,
           CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS click_through,
           CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS purchase_through
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY cohort_week
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): per user,
    the first view, the first click strictly AFTER that view, and the
    first purchase strictly AFTER that click — the sequential-pattern
    constraint that separates a funnel from three independent counts.
    Cohorted by the week of the first view, with per-stage conversion
    rates.

    Three stage tables built by filtered min-aggregations, each joined
    to the previous stage on user_id — every shuffle keys on user_id,
    so with the event stream bucketed (or AQE co-partitioning) the
    whole funnel runs in one partitioning; the final rollup is a
    small groupBy on the cohort week. Integer time math throughout,
    divisions only at the edge."""
    ev = t(spark, sf_dir, "events")
    e = ev.select("user_id", events_ts_us(ev).alias("ts_us"), "event_type")
    j = funnel_stages(e)
    clicked = F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
    purchased = F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
    return j.groupBy(
        F.expr("view_ts div 604800000000").alias("cohort_week")
    ).agg(
        F.count("*").alias("n_viewers"),
        F.sum(clicked).cast("bigint").alias("n_clicked"),
        F.sum(purchased).cast("bigint").alias("n_purchased"),
        (F.sum(clicked).cast("double") / F.count("*")).alias("click_through"),
        (F.sum(purchased).cast("double") / F.count("*")).alias("purchase_through"),
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS sv2
      FROM events GROUP BY event_type
    ),
    m AS (
      SELECT event_type,
             sv / n AS mean_value,
             sqrt(greatest(0.0, sv2 / n - (sv / n) * (sv / n))) AS std_value
      FROM s
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) - m.mean_value)
               / m.std_value AS zscore
      FROM events e JOIN m ON e.event_type = m.event_type
      WHERE m.std_value > 0
    )
    SELECT event_id, event_type, value, zscore FROM z WHERE abs(zscore) > 3.0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection — the telemetry guardrail a
    pipeline runs over its event stream (value spikes, broken
    instrumentation). Moments are DECIMAL(18,2)-exact sums (the values
    are 2-decimal amounts) cast to double only at the edge, so
    mean/stddev — and therefore the outlier SET — are bit-identical
    across engines; IEEE sqrt and division are correctly rounded.

    One groupBy(event_type) builds the 5-row moment table, broadcast
    back onto the scan; the z computation is pure columnar. No window,
    no second pass over the data — the textbook two-moment one-pass
    outlier scan."""
    e = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return flag_value_outliers(e, event_value_moments(e))


def event_value_moments(e: DataFrame) -> DataFrame:
    """(event_type, mean_value, std_value) from an events-shaped frame:
    DECIMAL(18,2)-exact one-pass sums, doubles only at the edge. Shared
    by the batch outlier scan and its streaming twin
    (streaming/pipeline_stream.py stream_anomaly_zscore) so the two can
    never disagree on the reference distribution."""
    d = _dec("value")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d).cast("double").alias("sv"),
        F.sum(d * d).cast("double").alias("sv2"),
    )
    # greatest(0, var): the two-moment form can round to a tiny
    # negative in doubles when a type's values are (near-)identical —
    # unguarded, Spark sqrt returns NaN silently while DuckDB raises,
    # so the clamp keeps both engines defined AND identical
    return s.select(
        "event_type",
        (F.col("sv") / F.col("n")).alias("mean_value"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("sv2") / F.col("n")
                - (F.col("sv") / F.col("n")) * (F.col("sv") / F.col("n")),
            )
        ).alias("std_value"),
    )


def funnel_stages(e: DataFrame) -> DataFrame:
    """Per-user funnel stage times over an (user_id, ts_us, event_type)
    frame: first view, first click strictly after it, first purchase
    strictly after that — one row per viewer with nullable click_ts /
    purchase_ts. Shared by the registry query and the property tests
    (tests/test_funnel_properties.py) so the sequential semantics are
    checked independently of the cohort rollup."""
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_ts"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left")


def flag_value_outliers(
    events: DataFrame, moments: DataFrame, threshold: float = 3.0
) -> DataFrame:
    """The z computation + threshold filter itself, shared verbatim by
    the batch scan (events_anomaly_zscore) and the streaming monitor
    (streaming/pipeline_stream.py stream_anomaly_zscore) — sharing only
    the moment TABLE would still let the two tiers' z formulas drift;
    sharing the expression makes tier disagreement impossible. Works on
    a batch or streaming frame (stream-static broadcast join)."""
    d = _dec("value")
    z = (d.cast("double") - F.col("mean_value")) / F.col("std_value")
    return (
        events.join(F.broadcast(moments), "event_type")
        # zero-variance guard: a type whose values are all identical has
        # std_value = 0 and z = ±Inf/NaN — Spark's NaN>x semantics differ
        # from DuckDB's, so both engines drop those rows up front (no
        # value of a constant distribution is an outlier)
        .filter(F.col("std_value") > 0)
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > threshold)
    )


@register(
    "large_order_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line quantity exceeds a threshold, joined back to their customers —
    the group-filter-then-semi-join pattern Q18's correlated IN
    subquery decorrelates to. The HAVING compare runs on the exact
    DECIMAL sum in both engines (doubles only in the output column).

    Scale shape: the per-order quantity sum is one partial-aggregable
    groupBy on the fact key; the surviving order set is tiny (tail of
    the distribution), so it BROADCASTS onto orders and the enriched
    result broadcasts onto customer — no fact-sized shuffle after the
    first aggregation."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 300)
        .select("l_orderkey", F.col("sum_qty_dec").cast("double").alias("sum_qty"))
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    enriched = o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
    out = c.join(F.broadcast(enriched), enriched.o_custkey == c.c_custkey)
    return out.select(
        "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
    )


@register(
    "nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS lineitems
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS yr, l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    nations by (supplier nation, customer nation, ship year) — the
    role-playing-dimension query: the SAME nation table joins twice
    under two aliases, and the cross-pair predicate keeps only the two
    directed flows.

    Scale shape: both dim chains are pre-filtered to the two named
    nations BEFORE touching the fact (supplier and customer shrink to
    2/|nations| of themselves), then broadcast; the only fact-sized
    exchange is the orders join."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = ("NATION_1", "NATION_2")
    n1 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey", "cust_nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("yr")
    ).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("lineitems"),
    )


@register(
    "cold_customers",
    oracle="""
    WITH thr AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    ),
    cold AS (
      SELECT c.c_nationkey, CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer c, thr
      WHERE c.c_acctbal > thr.a
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
    )
    SELECT n_name AS nation, count(*) AS n_customers,
           CAST(sum(bal) AS DOUBLE) AS total_acctbal
    FROM cold JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def cold_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with an
    above-average positive account balance and no URGENT-priority
    order, counted per nation — the scalar-subquery + NOT EXISTS
    pattern, decorrelated Spark-style as a 1-row threshold broadcast
    plus a left-anti join against the filtered order keys (the
    filter-inside-NOT-EXISTS variant, so the anti join's build side is
    a fraction of orders). The threshold divides an exact DECIMAL sum
    (as double) by the count, so both engines compare against the
    identical double.

    Scale shape: one scalar aggregate broadcast (BNLJ whitelisted —
    constant build side), one anti join keyed on custkey, one tiny
    nation broadcast; no fact-sized shuffle beyond the anti join."""
    c = t(spark, sf_dir, "customer")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("a")
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cold = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        cold.join(F.broadcast(n), cold.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


_HOUR_US = 3_600_000_000


@register(
    "events_gapfill_locf",
    oracle=f"""
    WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events),
    b AS (
      SELECT event_type, (ts_us // {_HOUR_US}) * {_HOUR_US} AS bucket_us,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
      FROM e GROUP BY event_type, bucket_us
    ),
    r AS (
      SELECT (min(ts_us) // {_HOUR_US}) * {_HOUR_US} AS lo,
             (max(ts_us) // {_HOUR_US}) * {_HOUR_US} AS hi
      FROM e
    ),
    grid AS (
      SELECT t.event_type, g.bucket_us
      FROM (SELECT DISTINCT event_type FROM e) t,
           (SELECT unnest(range(r.lo, r.hi + 1, {_HOUR_US})) AS bucket_us FROM r) g
    )
    SELECT grid.event_type, grid.bucket_us,
           CAST(coalesce(b.n_events, 0) AS BIGINT) AS n_events,
           b.avg_value,
           last_value(b.avg_value IGNORE NULLS) OVER (
             PARTITION BY grid.event_type ORDER BY grid.bucket_us
             ROWS UNBOUNDED PRECEDING) AS locf_avg
    FROM grid LEFT JOIN b USING (event_type, bucket_us)
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward —
    the hypertable `time_bucket_gapfill + locf` shape: a dense hourly
    (event_type x bucket) grid over the stream's full range, empty
    buckets emitted with n_events = 0 and the previous bucket's average
    carried forward (leading gaps stay NULL). The op every monitoring
    dashboard needs and plain GROUP BY cannot produce (it has no rows
    for the gaps).

    Scale shape: one keyed aggregation builds the measured buckets; the
    grid is |types| x |hours| rows built from a 1-row min/max broadcast
    (BNLJ whitelisted — constant build side) and joined back on the
    grid key; LOCF is a window per type ordered by bucket, partition
    size = grid hours, independent of event count."""
    ev = t(spark, sf_dir, "events")
    e = ev.select("event_type", events_ts_us(ev).alias("ts_us"), "value")
    bucket = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("bucket_us")
    b = e.groupBy("event_type", bucket).agg(
        F.count("*").alias("n_events"),
        (F.sum(_dec("value")).cast("double") / F.count("*")).alias("avg_value"),
    )
    r = e.agg(
        (F.min("ts_us") - F.min("ts_us") % _HOUR_US).alias("lo"),
        (F.max("ts_us") - F.max("ts_us") % _HOUR_US).alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(r))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(_HOUR_US))
            ).alias("bucket_us"),
        )
    )
    joined = grid.join(b, ["event_type", "bucket_us"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket_us",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("locf_avg"),
    )


@register(
    "events_session_paths",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    lagged AS (
      SELECT user_id, event_id, event_type, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, event_id, event_type)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts_us,
             CAST(sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id, event_type
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM lagged
    ),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>'
                        ORDER BY ts_us, event_id, event_type) AS path
      FROM sess GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the top-20 most common ordered
    event-type sequences per session (gap-based 30-min sessions, same
    rule as events_sessionization) — the product-analytics "user
    journey" query. The in-session order is totalized on
    (ts_us, event_id, event_type) because the synthetic keys are not
    unique (CLAUDE.md), so both engines agree on every path string:
    Spark builds it as sort_array over (ts, id, type) structs -> the
    projected type sequence, the oracle as an ORDER BY string_agg.

    Scale shape: everything is keyed on user_id (lag window, running
    sum, path aggregation) — one shuffle class; the path histogram is
    one more count groupBy; TakeOrdered for the top-20 (no global
    sort)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", events_ts_us(ev).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id", "event_type")
    prev = F.lag("ts_us").over(w)
    brk = F.when(
        prev.isNotNull() & ((F.col("ts_us") - prev) > 1_800_000_000), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("sid", F.sum(brk).over(wrun).cast("bigint"))
    paths = sess.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@register(
    "events_hourly_ohlc",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    )
    SELECT event_type,
           (ts_us // {_HOUR_US}) * {_HOUR_US} AS bucket_us,
           count(*) AS n_events,
           CAST((min(struct_pack(ts := ts_us, eid := event_id, v := v))).v AS DOUBLE) AS open,
           CAST(max(v) AS DOUBLE) AS high,
           CAST(min(v) AS DOUBLE) AS low,
           CAST((max(struct_pack(ts := ts_us, eid := event_id, v := v))).v AS DOUBLE) AS close
    FROM e GROUP BY event_type, bucket_us
    """,
)
def events_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (open/high/low/close — the
    time-series downsampling shape candlestick dashboards and feature
    pipelines use): open/close are the first/last value in the bucket,
    selected with the min/max-of-struct device over (ts, event_id,
    value) so ties resolve by the same total order in both engines —
    no argmin/argmax tie ambiguity, no window pass.

    Scale shape: ONE partial-aggregable groupBy over the scan (struct
    min/max combine map-side like any min/max); no window, no join —
    the cheapest possible downsampler."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        events_ts_us(ev).alias("ts_us"),
        "event_id",
        _dec("value").alias("v"),
    )
    bucket = (F.col("ts_us") - F.col("ts_us") % _HOUR_US).alias("bucket_us")
    first = F.min(F.struct(F.col("ts_us"), F.col("event_id"), F.col("v")))
    last = F.max(F.struct(F.col("ts_us"), F.col("event_id"), F.col("v")))
    return e.groupBy("event_type", bucket).agg(
        F.count("*").alias("n_events"),
        first.getField("v").cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        last.getField("v").cast("double").alias("close"),
    )


# proximity window for the banded range join: ±4 hours in microseconds
# (wide enough for real per-user co-occurrence signal on the synthetic
# event spacing; the band width below equals it so every match lies in
# the error's own bucket or an adjacent one)
_PROX_US = 14_400_000_000

# ONE oracle definition shared with the streaming twin
# (plans/streaming_twins.py) so the batch query and its ingestion-path
# twin can never verify against different truths — the _CLUSTERS_CTE
# device (pipeline/clustering.py)
PROXIMITY_ORACLE_SQL = f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    )
    SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_nearby,
           CAST(coalesce(sum(b.v), 0) AS DOUBLE) AS nearby_value
    FROM e a LEFT JOIN e b
      ON a.user_id = b.user_id AND b.event_type IN ('click', 'view')
      AND abs(b.us - a.us) <= {_PROX_US}
    WHERE a.event_type = 'error'
    GROUP BY a.event_id
    """


@register("events_error_proximity", oracle=PROXIMITY_ORACLE_SQL)
def events_error_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded time-range join (the interval-join shape Spark lacks as a
    primitive): for every error event, how many click/view events the
    same user produced within ±4 hours, and their summed value — the
    "what was the user doing around the failure" query, and the
    template for any |t_a - t_b| <= W range join at scale.

    Scale shape: a naive range join is a per-user cross product; the
    banded form buckets time into W-width bands and joins on
    (user_id, band) with the error side exploded into its 3 candidate
    bands (a match within ±W always lies in the same or an adjacent
    band, and each candidate event lives in exactly ONE band, so no
    dedup pass is needed). The join is a bounded equi shuffle — never
    a nested-loop — and the residual |dt| filter runs columnar on the
    joined rows. Zero-match errors are restored by a left join against
    the error set (AQE broadcasts the per-error aggregate when small).
    Value sums ride DECIMAL(18,2) and cast to double at the edge
    (CLAUDE.md float rules)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        events_ts_us(ev).alias("us"),
        "event_type",
        _dec("value").alias("v"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", F.col("us").alias("err_us")
    )
    band = F.expr(f"err_us div {_PROX_US}")
    probed = errors.select(
        "err_id",
        "user_id",
        "err_us",
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    cand = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("us").alias("cand_us"),
        "v",
        F.expr(f"us div {_PROX_US}").alias("band"),
    )
    hits = probed.join(cand, ["user_id", "band"]).filter(
        F.abs(F.col("cand_us") - F.col("err_us")) <= _PROX_US
    )
    agg = hits.groupBy("err_id").agg(
        F.count("*").alias("n_nearby"), F.sum("v").alias("sum_v")
    )
    # distinct: the oracle GROUPs BY event_id, so a duplicated error
    # event_id (synthetic keys are not guaranteed unique — CLAUDE.md)
    # must still emit ONE merged row, not one per copy
    return (
        errors.select("err_id")
        .distinct()
        .join(agg, "err_id", "left")
        .select(
            F.col("err_id").alias("event_id"),
            F.coalesce(F.col("n_nearby"), F.lit(0)).cast("bigint").alias("n_nearby"),
            F.coalesce(F.col("sum_v").cast("double"), F.lit(0.0)).alias(
                "nearby_value"
            ),
        )
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "events_type_hour_pivot",
    oracle=f"""
    WITH e AS (
      SELECT (epoch_us(ts) // {_HOUR_US}) % 24 AS hour_of_day, event_type
      FROM events
    )
    SELECT hour_of_day,
           {", ".join(
               f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT) AS {et}"
               for et in _EVENT_TYPES
           )}
    FROM e GROUP BY hour_of_day
    """,
)
def events_type_hour_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type activity matrix via groupBy().pivot()
    with an EXPLICIT category list (operators/reshape.pivot_counts):
    the long->wide reporting reshape, compiled by Spark into one hash
    aggregate of conditional counts — the same plan the oracle's CASE
    columns spell out by hand. Missing cells are dense bigint 0, so
    the wide table joins cleanly downstream.

    Scale shape: one partial-aggregable groupBy on a 24-row key; the
    explicit category list avoids pivot's extra distinct-discovery job
    and bounds the width (reshape.py module note)."""
    from lakeview_spark.operators.reshape import pivot_counts

    ev = t(spark, sf_dir, "events")
    e = ev.select(
        ((events_ts_us(ev) / F.lit(_HOUR_US)).cast("bigint") % 24).alias(
            "hour_of_day"
        ),
        "event_type",
    )
    return pivot_counts(e, ["hour_of_day"], "event_type", _EVENT_TYPES)


@register(
    "small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS small_lineitems
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < pa.half_avg
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    CORRELATED-subquery classic (l_quantity < half the part's own
    average), written decorrelated from the start: the per-part average
    is one groupBy, joined back to the fact instead of re-running a
    subquery per row. The quantity average is exact in both engines
    (integral doubles sum without rounding; one correctly-rounded
    division), so the filter boundary cannot drift.

    Scale shape: one partial-aggregable groupBy on l_partkey, one
    broadcast of the filtered brand dim, one fact join on l_partkey —
    no nested-loop re-evaluation anywhere."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
    )
    return j.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("small_lineitems"),
    )


@register(
    "promo_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS qualifying
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def promo_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of brand/size/quantity conjunctions
    spanning both join sides — the disjunctive-pushdown stress test.
    Catalyst extracts the common single-side implications (the brand IN
    set prunes the part scan, the quantity envelope 1..30 prunes the
    fact scan) so each side scans a superset cheaply and the exact
    disjunction evaluates post-join, instead of a full cross read.

    Scale shape: broadcast part dim, one fact pass; the residual OR is
    columnar."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return j.filter(cond).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("qualifying"),
    )


@register(
    "flagged_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
      AND NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey
                        AND l_returnflag = 'R' AND l_quantity >= 50)
    """,
)
def flagged_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 family: the EXISTS / NOT EXISTS composition — suppliers
    with at least one returned item (left SEMI join) but no max-size
    (quantity-50) return (left ANTI join) — "returns, but only small
    ones". Semi/anti are the decorrelated physical
    forms of EXISTS; neither materializes the match set, both
    short-circuit per key.

    Scale shape: two fact passes, each pre-filtered columnar and
    reduced to the supplier-key set; the supplier dim is the small side
    of both joins."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    big_returns = li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 50)
    ).select("l_suppkey")
    return (
        s.join(returned, s.s_suppkey == returned.l_suppkey, "left_semi")
        .join(big_returns, s.s_suppkey == big_returns.l_suppkey, "left_anti")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "important_parts",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS val
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(ROUND(sum(val), 2) AS DOUBLE) * 0.0007 AS thr FROM pr)
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pr, tot WHERE CAST(val AS DOUBLE) > thr
    """,
)
def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part revenue above a fraction of the GLOBAL
    total (0.07% — above the ~0.05% uniform share, so the filter has
    real selectivity) — the scalar-subquery-threshold HAVING. The
    threshold is one 1-row aggregate broadcast against the per-part
    table. Sums stay DECIMAL (exact, order-independent); the compare
    happens in DOUBLE on BOTH sides, explicitly: each engine casts the
    same exact decimals with a correctly-rounded cast, multiplies by
    the same double literal (IEEE-exact), and compares identical
    doubles. The earlier form compared Spark-side in double (sum *
    lit(0.0007) promotes) but DuckDB-side in DECIMAL(38,8) — a latent
    cross-engine divergence whenever a part lands within an ulp of the
    threshold (r5 ADVICE finding). The GLOBAL total additionally rounds
    to scale 2 before its double cast (the r8 2^53 edge rule,
    pricing_summary docstring): past 2^53 unscaled, the two engines'
    decimal->double conversions round differently, which would shift
    the threshold by an ulp and flip borderline parts.

    Scale shape: one partial-aggregable groupBy on l_partkey, one
    scalar broadcast, one columnar filter."""
    li = t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    pr = li.groupBy("l_partkey").agg(F.sum(rev).alias("val"))
    thr = pr.agg((F.round(F.sum("val"), 2).cast("double") * F.lit(0.0007)).alias("thr"))
    return (
        pr.crossJoin(F.broadcast(thr))
        .filter(F.col("val").cast("double") > F.col("thr"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (equi-width histogram)
# ---------------------------------------------------------------------------
#
# Completes the sketch family (CMS heavy hitters, KMV distinct): a
# 128-bin equi-width histogram per event type is the simplest MERGEABLE
# quantile structure — per-partition counter grids combine by
# element-wise add (Spark's partial aggregation does exactly this
# map-side), so quantile estimation over 100 TB costs one narrow scan
# plus a types x 128 shuffle, never a global sort. The estimate is the
# lower edge of the first bin whose cumulative count reaches q*n; its
# error is bounded by one bin width (reported alongside). t-digest/KLL
# would tighten tails at the same mergeability — the histogram variant
# keeps every step floor/div exact so both engines agree bit-for-bit.
_QSK_BINS = 128
_QSK_QS = (0.5, 0.9, 0.99)


@register(
    "events_quantile_sketch",
    oracle=f"""
    WITH mom AS (
      SELECT event_type, count(*) AS n_events,
             min(value) AS mn, max(value) AS mx,
             (max(value) - min(value)) / {_QSK_BINS} AS width
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type,
             CASE WHEN m.width = 0 THEN 0
                  ELSE LEAST({_QSK_BINS - 1},
                             CAST(floor((e.value - m.mn) / m.width) AS INT))
             END AS bin
      FROM events e JOIN mom m USING (event_type)
    ),
    counts AS (
      SELECT event_type, bin, count(*) AS bin_count
      FROM binned GROUP BY event_type, bin
    ),
    cum AS (
      SELECT event_type, bin, bin_count,
             sum(bin_count) OVER (PARTITION BY event_type ORDER BY bin
                                  ROWS UNBOUNDED PRECEDING) AS cum_count
      FROM counts
    ),
    hits AS (
      SELECT c.event_type, q.q, c.bin, c.bin_count,
             CAST(c.cum_count AS BIGINT) AS cum_count,
             m.n_events, m.mn + c.bin * m.width AS est_value,
             m.width AS err_bound,
             row_number() OVER (PARTITION BY c.event_type, q.q
                                ORDER BY c.bin) AS rn
      FROM cum c
      JOIN mom m USING (event_type)
      CROSS JOIN (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QSK_QS)}]) AS q) q
      WHERE c.cum_count >= q.q * m.n_events
    )
    SELECT event_type, q, est_value, err_bound, bin, bin_count, cum_count,
           CAST(n_events AS BIGINT) AS n_events
    FROM hits WHERE rn = 1
    """,
)
def events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type from a {_QSK_BINS}-bin
    mergeable histogram sketch (section comment above: why the
    counter-grid shape, not a global sort, is the 100 TB quantile
    design). Every arithmetic step — bin = floor((v - min)/width),
    estimate = min + bin*width, threshold cum >= q*n — is the same
    correctly-rounded double op in both engines, so the sketch
    hash-checks exactly; `err_bound` (one bin width) states the
    estimator's guarantee next to its answer."""
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    mom = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    ).withColumn("width", (F.col("mx") - F.col("mn")) / F.lit(_QSK_BINS))
    binned = ev.join(F.broadcast(mom), "event_type").select(
        "event_type",
        F.when(F.col("width") == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(_QSK_BINS - 1),
                F.floor((F.col("value") - F.col("mn")) / F.col("width")).cast("int"),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count("*").alias("bin_count")
    )
    w = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.withColumn("cum_count", F.sum("bin_count").over(w))
    qdf = spark.createDataFrame([(float(q),) for q in _QSK_QS], "q double")
    hits = (
        cum.join(F.broadcast(mom.select("event_type", "n_events", "mn", "width")), "event_type")
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("cum_count") >= F.col("q") * F.col("n_events"))
        .select(
            "event_type",
            "q",
            (F.col("mn") + F.col("bin") * F.col("width")).alias("est_value"),
            F.col("width").alias("err_bound"),
            "bin",
            "bin_count",
            F.col("cum_count").cast("long").alias("cum_count"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
    wq = Window.partitionBy("event_type", "q").orderBy("bin")
    return (
        hits.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history (the lakehouse MERGE/upsert read shape)
# ---------------------------------------------------------------------------
#
# Slowly-changing-dimension type 2 build over a change log: collapse
# each user's event stream to its CHANGE records (an event whose
# event_type differs from the user's previous event — classic SCD2
# no-change suppression), then version them with [valid_from, valid_to)
# intervals and an is_current flag. This is the batch read-side of the
# upsert/merge machinery the reference's Hudi tables exist to support
# (timeline commits materialize exactly such versioned row histories;
# reference: TimelineCommitInstantsUploader's commit ordering), and the
# standard dimension-table shape every warehouse downstream of a lake
# expects. All engine-shared arithmetic is integer microseconds
# (events_ts_us == epoch_us) with (ts_us, event_id) total-order
# tiebreaks; change detection is IS DISTINCT FROM on the attribute.
@register(
    "events_user_scd2",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, ts_us,
             (event_type IS DISTINCT FROM
              lag(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id)) AS is_change
      FROM e
    ),
    changes AS (SELECT * FROM flagged WHERE is_change),
    versioned AS (
      SELECT user_id, event_type, ts_us AS valid_from_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS version,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS valid_to_us
      FROM changes
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from_us, valid_to_us,
           CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS BIGINT)
             AS is_current
    FROM versioned
    """,
)
def events_user_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history per user from the events change log:
    no-change records suppressed, each surviving version carrying
    [valid_from_us, valid_to_us) and an is_current flag (section
    comment above — the lakehouse upsert/merge read shape).

    Scale shape: two windows and nothing else, both partitioned by
    user_id (state = one user's events, never global); at 100 TB the
    change log would arrive time-partitioned and the merge would
    restrict to users present in the delta — the incremental form of
    the same two windows. No joins, no driver state; the scan prunes
    to the four referenced columns."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", events_ts_us(ev).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = e.withColumn(
        "is_change",
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)),
    ).filter(F.col("is_change"))
    wv = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(wv).cast("long").alias("version"),
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wv).alias("valid_to_us"),
    ).withColumn(
        "is_current",
        F.when(F.col("valid_to_us").isNull(), 1).otherwise(0).cast("long"),
    )


# ---------------------------------------------------------------------------
# Quantized EWMA smoothing (integer-exact exponential moving average)
# ---------------------------------------------------------------------------
#
# Exponential smoothing is THE streaming-telemetry primitive Spark has
# no builtin for (a multiplicative recurrence is not a prefix sum, so
# no window frame expresses it). The CUSUM twin proved ordered folds
# replay across engines; this op extends the device to a MULTIPLICATIVE
# recurrence: values move to exact integer cents (DECIMAL(18,2) * 100),
# alpha is pinned at 1/8, and each step is
#     s_t = floor((x_t + 7 * s_{t-1}) / 8)
# where the divide-by-8 happens in DOUBLE: x + 7s < 2^53 makes the sum
# exact, division by a power of two is exact, so floor() is the true
# floored quotient in BOTH engines — no integer-division rounding-mode
# hazard (Spark `div` truncates toward zero, DuckDB `//` floors; on
# negatives they disagree, floor(x/8.0) cannot). State is per
# (event_type, hour bucket) with s_1 = x_1, so partitions are bounded
# and the fold is the same bounded-array aggregate() the session-path
# and CUSUM oracles already pay. DuckDB list_reduce rebinding rule:
# maxdev is packed BEFORE s so it reads the pre-rebind acc.s (CLAUDE.md
# sequential-rebinding hazard).
@register(
    "events_ewma_quantized",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM events
    ),
    groups AS (
      SELECT event_type, (ts_us // {_HOUR_US}) * {_HOUR_US} AS bucket_us,
             list(struct_pack(maxdev := CAST(0 AS BIGINT), s := x)
                  ORDER BY ts_us, event_id) AS xs
      FROM e GROUP BY event_type, (ts_us // {_HOUR_US}) * {_HOUR_US}
    ),
    folded AS (
      SELECT event_type, bucket_us,
             CAST(len(xs) AS BIGINT) AS n_events,
             list_reduce(xs, (acc, it) -> struct_pack(
               maxdev := greatest(acc.maxdev,
                 abs(CAST(floor((it.s + 7 * acc.s) / 8.0) AS BIGINT) - it.s)),
               s := CAST(floor((it.s + 7 * acc.s) / 8.0) AS BIGINT)
             )) AS r
      FROM groups
    )
    SELECT event_type, bucket_us, n_events,
           r.s AS ewma_cents, r.maxdev AS max_abs_dev_cents
    FROM folded
    """,
)
def events_ewma_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact EWMA (alpha=1/8) per (event_type, hour): final
    smoothed value and the max absolute deviation of any observation
    from the running smooth — the telemetry-drift primitive (section
    comment above: why the floor((x+7s)/8.0) form is engine-identical
    and why a recurrence needs an ordered fold, not a window frame).

    Scale shape: one groupBy keyed (type, hour) — bounded partitions —
    then a per-group sort_array + aggregate() fold entirely inside the
    aggregation; no window over the full stream, no second shuffle. At
    100 TB hour-bucket state is the same boundedness argument as the
    session/CUSUM folds; a cross-bucket carryover would chain bucket
    results on the driver (hours x types rows, broadcast scale)."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        events_ts_us(ev).alias("ts_us"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("x"),
    )
    grouped = (
        e.withColumn(
            "bucket_us", F.expr(f"(ts_us div {_HOUR_US}) * {_HOUR_US}")
        )
        .groupBy("event_type", "bucket_us")
        .agg(
            F.sort_array(F.collect_list(F.struct("ts_us", "event_id", "x"))).alias(
                "xs"
            )
        )
    )
    step_s = "CAST(floor((it.x + 7 * acc.s) / 8.0) AS BIGINT)"
    fold = F.expr(
        "aggregate("
        "  slice(xs, 2, greatest(size(xs) - 1, 0)),"
        "  named_struct('maxdev', CAST(0 AS BIGINT), 's', xs[0].x),"
        f" (acc, it) -> named_struct("
        f"   'maxdev', greatest(acc.maxdev, abs({step_s} - it.x)),"
        f"   's', {step_s}))"
    )
    return grouped.select(
        "event_type",
        "bucket_us",
        F.size("xs").cast("long").alias("n_events"),
        fold.getField("s").alias("ewma_cents"),
        fold.getField("maxdev").alias("max_abs_dev_cents"),
    )


@register(
    "market_share_q8",
    oracle="""
    WITH vols AS (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ),
    agg AS (
      SELECT o_year,
             ROUND(sum(CASE WHEN supp_nation = 'NATION_9'
                            THEN vol ELSE 0 END), 2) AS nat,
             ROUND(sum(vol), 2) AS tot
      FROM vols GROUP BY o_year
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(nat AS DOUBLE) AS nation_volume,
           CAST(tot AS DOUBLE) AS total_volume,
           CASE WHEN tot > 0
                THEN CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE) END AS mkt_share
    FROM agg
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): the two-nation-role join
    — nation joins the star TWICE, once through the customer side
    (restricting the market to region ASIA) and once through the
    supplier side (labeling each sale's origin) — with the share as a
    conditional aggregation per order year. The classic case where one
    dim table appears under two aliases with different join keys; the
    reference's star joins never need this, so it rounds out J7.

    Determinism: volumes are DECIMAL(18,2)-exact products, per-year
    sums ROUND to scale 2 in both engines before the double edge cast
    (the 2^53 rule), and the share is one guarded division of those
    identical doubles.

    Scale shape: region/nation/part/supplier broadcast; the
    customer⋈orders and orders⋈lineitem joins are the same key-partitioned
    fact joins local_supplier_volume plans; the final agg is a
    handful-of-years groupBy."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vols = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("vol"),
            "supp_nation",
        )
    )
    agg = vols.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_9", F.col("vol")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ),
            2,
        ).alias("nat"),
        F.round(F.sum("vol"), 2).alias("tot"),
    )
    return agg.select(
        F.col("o_year").cast("bigint").alias("o_year"),
        F.col("nat").cast("double").alias("nation_volume"),
        F.col("tot").cast("double").alias("total_volume"),
        F.when(
            F.col("tot") > 0,
            F.col("nat").cast("double") / F.col("tot").cast("double"),
        ).alias("mkt_share"),
    )


@register(
    "supplier_profit_q9",
    oracle="""
    WITH profit AS (
      SELECT sn.n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))
             - CAST(p_retailprice AS DECIMAL(18,2))
               * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      JOIN part     ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
    )
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(ROUND(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM profit GROUP BY nation, o_year
    """,
)
def supplier_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): the DEEPEST star join in
    the family — lineitem fans out to part (name-substring filter),
    supplier -> nation (profit attribution), and orders (fiscal year)
    in one plan, grouped (nation, year). The reference's star joins
    top out at two dims; Q9's four-way fan-out is the canonical
    "measure joins every dimension at once" plan, and the one where
    join ORDER matters most at scale (the part filter must prune the
    fact rows before the orders fact-fact join pays its shuffle).

    Adaptation: the testdata has no partsupp table, so the cost side
    of the TPC-H profit expression (ps_supplycost * l_quantity) uses
    the part's retail price as the unit cost — same join shape, same
    DECIMAL-exact arithmetic, profit may legitimately be negative.
    Determinism: amounts are DECIMAL(18,2)-exact products; per-group
    sums ROUND to scale 2 in both engines before the double edge cast
    (the 2^53 rule).

    Scale shape: part (filtered), supplier, and nation broadcast into
    the lineitem scan — the name filter prunes the fact stream BEFORE
    the only key-partitioned join (orders ⋈ lineitem on orderkey);
    the final agg is a (nations x years)-key groupBy, partial
    map-side. Filters push to the part/lineitem parquet scans."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    amount = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    profit = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"),
    ).select(
        "nation",
        F.col("o_year").cast("bigint").alias("o_year"),
        "n_lines",
        "sum_profit",
    )


@register(
    "promo_type_share_q14",
    oracle="""
    WITH rev AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             p_type,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS amount
      FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    agg AS (
      SELECT ship_month,
             ROUND(sum(CASE WHEN p_type = 'PROMO'
                            THEN amount ELSE 0 END), 2) AS promo,
             ROUND(sum(amount), 2) AS total
      FROM rev GROUP BY ship_month
    )
    SELECT ship_month,
           CAST(promo AS DOUBLE) AS promo_revenue,
           CAST(total AS DOUBLE) AS total_revenue,
           CASE WHEN total > 0
                THEN 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)
           END AS promo_share_pct
    FROM agg
    """,
)
def promo_type_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of each shipping
    month's discounted revenue that came from PROMO-type parts — the
    one Q-family member whose output is a conditional-share TIME
    SERIES rather than a ranking. (The reference's Q14 filters to one
    month; reporting every month is the same plan with a richer
    output and no date literals to drift.)

    Determinism: revenue amounts are DECIMAL(18,2)-exact, per-month
    sums ROUND to scale 2 in both engines before the double edge cast
    (the 2^53 rule), month keys are formatted strings (identical
    yyyy-MM rendering in both engines), and the share is one guarded
    division of identical doubles.

    Scale shape: part broadcasts into the lineitem scan (the only
    join), the agg is a months-sized groupBy, partial map-side; both
    scans prune to the referenced columns."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        "p_type",
        (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("amount"),
    )
    agg = rev.groupBy("ship_month").agg(
        F.round(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("amount")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ),
            2,
        ).alias("promo"),
        F.round(F.sum("amount"), 2).alias("total"),
    )
    return agg.select(
        "ship_month",
        F.col("promo").cast("double").alias("promo_revenue"),
        F.col("total").cast("double").alias("total_revenue"),
        F.when(
            F.col("total") > 0,
            F.lit(100.0)
            * F.col("promo").cast("double")
            / F.col("total").cast("double"),
        ).alias("promo_share_pct"),
    )


# market-basket mining: minimum co-order support and report size
BASKET_MIN_SUPPORT = 2
BASKET_TOP = 32


def _basket_items_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeview_spark.operators.scale import spread_unsplittable

    raw = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    )
    # okey partitioning satisfies the (okey, pkey) distinct's
    # clustering, so the spread exchange REPLACES the distinct's
    return spread_unsplittable(raw, "okey").distinct()


def basket_items_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (okey, pkey) order-item table (r15, guide §2.1 — the
    k-core replay rule, scalar edition): orders_market_basket
    referenced it five times in one plan, putting five lineitem scans
    in the plan. 2 bigints/row, built once per (session, dataset)."""
    from lakeview_spark.operators.materialize import materialized

    return materialized(spark, "basket_items", sf_dir, _basket_items_build)


def _basket_sup_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        basket_items_materialized(spark, sf_dir)
        .groupBy("pkey")
        .agg(F.count("*").cast("bigint").alias("orders_with"))
    )


def basket_sup_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part order supports derived from the item scratch (<= part
    count rows) — read three times per plan (frequent filter + both
    support join sides)."""
    from lakeview_spark.operators.materialize import materialized

    return materialized(spark, "basket_sup", sf_dir, _basket_sup_build)


@register(
    "orders_market_basket",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
    ),
    nord AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM items),
    sup AS (
      SELECT pkey, CAST(count(*) AS BIGINT) AS orders_with FROM items GROUP BY pkey
    ),
    pairs AS (
      SELECT a.pkey AS part_a, b.pkey AS part_b,
             CAST(count(*) AS BIGINT) AS pair_orders
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.pkey < b.pkey
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_SUPPORT}
    ),
    scored AS (
      SELECT part_a, part_b, pair_orders,
             sa.orders_with AS orders_a, sb.orders_with AS orders_b, n_orders
      FROM pairs
      JOIN sup sa ON sa.pkey = part_a
      JOIN sup sb ON sb.pkey = part_b
      CROSS JOIN nord
    )
    SELECT part_a, part_b, pair_orders, orders_a, orders_b, n_orders,
           CAST(pair_orders AS DOUBLE) / orders_a AS confidence_a_to_b,
           CASE WHEN orders_a * orders_b > 0
                THEN CAST(pair_orders * n_orders AS DOUBLE)
                     / CAST(orders_a * orders_b AS DOUBLE) END AS lift
    FROM scored
    ORDER BY pair_orders DESC, part_a, part_b
    LIMIT {BASKET_TOP}
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over orders: the top co-ordered
    part pairs with support, confidence, and lift — the classic
    frequent-itemset (Apriori level-2) analytics workload, a genuinely
    different self-join class from the star joins: pairs are generated
    WITHIN order groups (fan-out bounded by basket size, ~4-7 lines
    per order — cost is sum of per-order size², never corpus²).

    Determinism: supports are exact BIGINT counts; confidence and lift
    are single divisions of identical exact integers (correctly
    rounded in both engines — the exact-int double division device);
    the report ranks by (pair_orders DESC, part_a, part_b) — an
    all-integer total order, so the LIMIT never ties on a float.

    Scale shape (r12, VERDICT r11 next-5): items below
    BASKET_MIN_SUPPORT are pruned BEFORE pair generation —
    output-invariant by the Apriori property (a pair's support <= each
    member's support, so no surviving pair can contain an infrequent
    item), which is why the oracle is byte-identical to r11's; on the
    synthetic lineitem every part is frequent at every SF (the prune's
    bind is a real-retail-data property), so r12 also replaced the
    l_orderkey pair SELF-JOIN (two shuffled sides) with the classic
    basket shape: groupBy(okey) -> sorted distinct part array ->
    in-array 2-combination comprehension — ONE shuffle, fan-out still
    bounded by basket size (~4-7, sum of per-order size², never
    corpus²), and no join skew surface at all. Item supports and the
    1-row order count broadcast into the pair table; the report is
    TakeOrderedAndProject, never a global sort.

    r15 (guide §2.1 replay — the k-core rule, scalar edition): the lazy
    distinct (okey, pkey) table was referenced FIVE times in one plan
    (order count, item supports, the frequent filter, and both support
    join sides), so the plan held five lineitem scans, each with its
    single-task scan-side partial aggregation (the unsplittable local
    file). The distinct item table is now a materialized scratch
    (2 bigints/row, spread on okey in the builder — the sanctioned
    repartition-before-kernel exception — so the distinct aggregation
    and the scratch files parallelize), and the per-part support table
    (<= part count rows) a second scratch derived from it: the
    registered plan reads 1 corpus scan (in the first build) + tiny
    parquet scans everywhere else."""
    items = basket_items_materialized(spark, sf_dir)
    nord = items.agg(F.countDistinct("okey").cast("bigint").alias("n_orders"))
    sup = basket_sup_materialized(spark, sf_dir)
    # Apriori level-1 prune: only frequent items can appear in a
    # frequent pair (identical distinct subtrees share one reused
    # exchange, so this adds a filter+join, not a rescan)
    frequent = sup.filter(F.col("orders_with") >= BASKET_MIN_SUPPORT).select("pkey")
    baskets = (
        items.join(frequent, "pkey")
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("pkey")).alias("ps"))
    )
    # pairs ride ONE packed BIGINT key (part_a * 2^32 + part_b; partkeys
    # fit 32 bits at any TPC-H scale) through the nearly-all-unique
    # count shuffle — one 8-byte key instead of a two-field struct cut
    # the sf1 agg 4.3 -> 3.4 s — and decode after the support filter
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), y -> x * 4294967296 + y)))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("pk"))
        .groupBy("pk")
        .agg(F.count("*").cast("bigint").alias("pair_orders"))
        .filter(F.col("pair_orders") >= BASKET_MIN_SUPPORT)
        .select(
            F.expr("pk div 4294967296").alias("part_a"),
            (F.col("pk") % 4294967296).alias("part_b"),
            "pair_orders",
        )
    )
    sa = sup.select(F.col("pkey").alias("part_a"), F.col("orders_with").alias("orders_a"))
    sb = sup.select(F.col("pkey").alias("part_b"), F.col("orders_with").alias("orders_b"))
    scored = (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(nord))
    )
    return (
        scored.select(
            "part_a",
            "part_b",
            "pair_orders",
            "orders_a",
            "orders_b",
            "n_orders",
            (F.col("pair_orders").cast("double") / F.col("orders_a")).alias(
                "confidence_a_to_b"
            ),
            F.when(
                F.col("orders_a") * F.col("orders_b") > 0,
                (F.col("pair_orders") * F.col("n_orders")).cast("double")
                / (F.col("orders_a") * F.col("orders_b")).cast("double"),
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_orders"), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


# RFM quartile machinery: 256-bin integer histograms (the
# mix_curriculum_schedule threshold device), scores 1..4 per axis
RFM_BINS = 256


def _rfm_cust_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeview_spark.operators.scale import spread_unsplittable

    o = spread_unsplittable(t(spark, sf_dir, "orders"), "o_custkey")
    scal = o.select("o_orderdate").agg(F.max("o_orderdate").alias("maxd"))
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_date"),
            F.count("*").cast("bigint").alias("freq"),
            (F.sum(_dec("o_totalprice")) * 100).cast("bigint").alias("mon"),
        )
        .crossJoin(F.broadcast(scal))
        .select(
            "custkey",
            F.datediff("maxd", "last_date").cast("bigint").alias("rec"),
            "freq",
            "mon",
        )
    )


def rfm_cust_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer (rec, freq, mon) — read by the RFM histogram build
    AND the scoring pass (r15, guide §2.1; customer-count rows)."""
    from lakeview_spark.operators.materialize import materialized

    return materialized(spark, "rfm_cust", sf_dir, _rfm_cust_build)


@register(
    "customer_rfm_segments",
    oracle=f"""
    WITH scal AS (SELECT max(o_orderdate) AS maxd FROM orders),
    cust AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', max(o_orderdate), (SELECT maxd FROM scal))
                  AS BIGINT) AS rec,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS mon
      FROM orders GROUP BY o_custkey
    ),
    meas AS (
      SELECT custkey, mon, m, v FROM (
        SELECT custkey, mon,
               unnest(['r', 'f', 'm']) AS m,
               unnest([rec, freq, mon]) AS v
        FROM cust)
    ),
    mv AS (SELECT m, v, CAST(count(*) AS BIGINT) AS cnt FROM meas GROUP BY m, v),
    rng AS (
      SELECT m, v, cnt,
             CAST(min(v) OVER (PARTITION BY m) AS BIGINT) AS mn,
             CAST(max(v) OVER (PARTITION BY m) AS BIGINT) AS mx,
             CAST(sum(cnt) OVER (PARTITION BY m) AS BIGINT) AS n
      FROM mv
    ),
    binned AS (
      SELECT m, ((v - mn) * {RFM_BINS - 1}) // greatest(mx - mn, 1) AS b,
             cnt, n
      FROM rng
    ),
    bins AS (
      SELECT m, b, CAST(sum(cnt) AS BIGINT) AS c, any_value(n) AS n
      FROM binned GROUP BY m, b
    ),
    cum AS (
      SELECT m, b, n,
             CAST(sum(c) OVER (PARTITION BY m ORDER BY b
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumc
      FROM bins
    ),
    thr AS (
      SELECT m,
             CAST(min(CASE WHEN 4 * cumc >= 1 * n THEN b END) AS BIGINT) AS t1,
             CAST(min(CASE WHEN 4 * cumc >= 2 * n THEN b END) AS BIGINT) AS t2,
             CAST(min(CASE WHEN 4 * cumc >= 3 * n THEN b END) AS BIGINT) AS t3
      FROM cum GROUP BY m
    ),
    ranges AS (
      SELECT m, any_value(mn) AS mn, any_value(mx) AS mx FROM rng GROUP BY m
    ),
    scored AS (
      SELECT v.custkey, v.mon, v.m,
             CASE WHEN ((v.v - r.mn) * {RFM_BINS - 1})
                       // greatest(r.mx - r.mn, 1) > t.t1 THEN 1 ELSE 0 END
           + CASE WHEN ((v.v - r.mn) * {RFM_BINS - 1})
                       // greatest(r.mx - r.mn, 1) > t.t2 THEN 1 ELSE 0 END
           + CASE WHEN ((v.v - r.mn) * {RFM_BINS - 1})
                       // greatest(r.mx - r.mn, 1) > t.t3 THEN 1 ELSE 0 END
               AS above
      FROM (SELECT custkey, mon, m, v FROM (
              SELECT custkey, mon, unnest(['r', 'f', 'm']) AS m,
                     unnest([rec, freq, mon]) AS v FROM cust)) v
      JOIN thr t ON t.m = v.m
      JOIN ranges r ON r.m = v.m
    ),
    rfm AS (
      SELECT custkey, any_value(mon) AS mon,
             CAST(4 - max(CASE WHEN m = 'r' THEN above END) AS BIGINT)
               AS r_score,
             CAST(1 + max(CASE WHEN m = 'f' THEN above END) AS BIGINT)
               AS f_score,
             CAST(1 + max(CASE WHEN m = 'm' THEN above END) AS BIGINT)
               AS m_score
      FROM scored GROUP BY custkey
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(mon) AS BIGINT) AS total_monetary_cents,
           CASE WHEN count(*) > 0
                THEN CAST(CAST(sum(mon) AS BIGINT) AS DOUBLE) / count(*)
           END AS avg_monetary_cents
    FROM rfm GROUP BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-analytics
    workload: per customer, Recency (days since last order), Frequency
    (order count), and Monetary (lifetime spend), each scored 1..4 by
    corpus quartile, rolled up per (R, F, M) segment (<= 64 cells)
    with customer counts and spend. Recency is inverted (recent = 4).

    NO global sort anywhere: quartile thresholds come from the
    mix_curriculum_schedule 256-bin integer histogram device — collapse
    the three measures to per-(measure, value) counts in ONE pass,
    derive min/max/n as per-measure windows over that collapsed table,
    bin, take thresholds by the division-free rule (smallest bin with
    4*cum >= q*n), and score each customer by three integer bin
    compares. Bin-resolution quartiles are deterministic in both
    engines (the documented device trade); monetary is exact integer
    CENTS (DECIMAL(18,2) sum * 100), the one division is guarded.

    Scale shape: two passes over the per-customer aggregate's lineage
    (histogram build + scoring — the ROC collapse device bounds it at
    two) plus one narrow max-date scan; thresholds/ranges are 3-row
    broadcasts; the final agg is <= 64 groups."""
    # r15 (guide §2.1 replay): the per-customer RFM table fed BOTH the
    # histogram build and the scoring pass, and its own lineage held
    # two orders scans (the aggregate + the max-date scalar) — four
    # single-task scans of the unsplittable local file per execution.
    # One customer-count-sized scratch write (builder spread on
    # o_custkey — the partitioning the groupBy needs) leaves both
    # passes parquet scans.
    cust = rfm_cust_materialized(spark, sf_dir)
    three = F.explode(
        F.array(
            F.struct(F.lit("r").alias("m"), F.col("rec").alias("v")),
            F.struct(F.lit("f").alias("m"), F.col("freq").alias("v")),
            F.struct(F.lit("m").alias("m"), F.col("mon").alias("v")),
        )
    )
    meas = cust.select("custkey", "mon", three.alias("x")).select(
        "custkey", "mon", F.col("x.m").alias("m"), F.col("x.v").alias("v")
    )
    mv = meas.groupBy("m", "v").agg(F.count("*").cast("bigint").alias("cnt"))
    wm = Window.partitionBy("m")
    rng = mv.select(
        "m",
        "v",
        "cnt",
        F.min("v").over(wm).cast("bigint").alias("mn"),
        F.max("v").over(wm).cast("bigint").alias("mx"),
        F.sum("cnt").over(wm).cast("bigint").alias("n"),
    )
    binned = rng.select(
        "m",
        F.expr(f"(v - mn) * {RFM_BINS - 1} div greatest(mx - mn, 1)").alias("b"),
        "cnt",
        "n",
    )
    bins = binned.groupBy("m", "b").agg(
        F.sum("cnt").cast("bigint").alias("c"), F.any_value("n").alias("n")
    )
    wc = Window.partitionBy("m").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "m", "b", "n", F.sum("c").over(wc).cast("bigint").alias("cumc")
    )
    thr = cum.groupBy("m").agg(
        *[
            F.min(F.when(4 * F.col("cumc") >= q * F.col("n"), F.col("b")))
            .cast("bigint")
            .alias(f"t{q}")
            for q in (1, 2, 3)
        ]
    )
    ranges = rng.groupBy("m").agg(
        F.any_value("mn").alias("mn"), F.any_value("mx").alias("mx")
    )
    b_expr = F.expr(f"(v - mn) * {RFM_BINS - 1} div greatest(mx - mn, 1)")
    above = (
        (b_expr > F.col("t1")).cast("int")
        + (b_expr > F.col("t2")).cast("int")
        + (b_expr > F.col("t3")).cast("int")
    )
    scored = (
        meas.join(F.broadcast(thr), "m")
        .join(F.broadcast(ranges), "m")
        .select("custkey", "mon", "m", above.alias("above"))
    )
    rfm = scored.groupBy("custkey").agg(
        F.any_value("mon").alias("mon"),
        (
            4 - F.max(F.when(F.col("m") == "r", F.col("above")))
        ).cast("bigint").alias("r_score"),
        (
            1 + F.max(F.when(F.col("m") == "f", F.col("above")))
        ).cast("bigint").alias("f_score"),
        (
            1 + F.max(F.when(F.col("m") == "m", F.col("above")))
        ).cast("bigint").alias("m_score"),
    )
    return rfm.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("mon").cast("bigint").alias("total_monetary_cents"),
        F.when(
            F.count("*") > 0,
            F.sum("mon").cast("bigint").cast("double") / F.count("*"),
        ).alias("avg_monetary_cents"),
    )


# The shared in-session transition-count derivation (30-min gap rule,
# (ts_us, event_id, event_type) total order, synthetic _start_/_end_
# states) — one CTE block used by the transition matrix AND the r12
# removal-effect attribution walk, so the two cannot drift.
_MARKOV_CNT_CTES = """e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    lagged AS (
      SELECT user_id, event_id, event_type, ts_us,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, event_id, event_type)
                  > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts_us,
             CAST(sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id, event_type
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM lagged
    ),
    seq AS (
      SELECT user_id, sid, event_type, ts_us, event_id,
             lead(event_type) OVER (PARTITION BY user_id, sid
                                    ORDER BY ts_us, event_id, event_type)
               AS next_type,
             row_number() OVER (PARTITION BY user_id, sid
                                ORDER BY ts_us, event_id, event_type) AS rn
      FROM sess
    ),
    trans AS (
      SELECT event_type AS from_type,
             coalesce(next_type, '_end_') AS to_type
      FROM seq
      UNION ALL
      SELECT '_start_' AS from_type, event_type AS to_type
      FROM seq WHERE rn = 1
    ),
    cnt AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
      FROM trans GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS from_total
      FROM cnt GROUP BY from_type
    )"""


@register(
    "events_markov_transitions",
    oracle=f"""
    WITH {_MARKOV_CNT_CTES}
    SELECT c.from_type, c.to_type, c.n_transitions, t.from_total,
           CASE WHEN t.from_total > 0
                THEN CAST(c.n_transitions AS DOUBLE) / t.from_total
           END AS prob
    FROM cnt c JOIN tot t ON t.from_type = c.from_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over in-session event
    sequences — the aggregated structure behind the path histograms
    (`events_session_paths` reports the top whole journeys; this
    reports where users GO from each state, incl. synthetic
    ``_start_``/``_end_`` states so session entry/exit are first-class
    transitions — the input to funnel leak analysis and removal-effect
    attribution). Sessions use the shared 30-min gap rule; in-session
    order is totalized on (ts_us, event_id, event_type) because the
    synthetic keys are not unique (CLAUDE.md).

    Determinism: transition counts are exact integers; the row
    probability is ONE guarded division of identical exact integers.

    Scale shape: every window (lag, running session sum, lead, rank)
    is keyed on user_id — one shuffle class, per-user partitions
    bounded by a user's history; the matrix is a (types+2)^2-key
    groupBy and the row totals derive from the matrix itself
    (types-sized), never a second corpus pass."""
    cnt = _markov_counts(spark, sf_dir)
    tot = cnt.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("from_total")
    )
    return cnt.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "from_total",
        F.when(
            F.col("from_total") > 0,
            F.col("n_transitions").cast("double") / F.col("from_total"),
        ).alias("prob"),
    )


def _markov_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared engine twin of _MARKOV_CNT_CTES: in-session
    transition counts (from_type, to_type, n_transitions) with
    synthetic _start_/_end_ states."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", events_ts_us(ev).alias("ts_us")
    )
    order = [F.col("ts_us"), F.col("event_id"), F.col("event_type")]
    wl = Window.partitionBy("user_id").orderBy(*order)
    lagged = e.withColumn(
        "brk",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(wl) > 1_800_000_000, 1
        ).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = lagged.withColumn("sid", F.sum("brk").over(ws).cast("bigint"))
    wse = Window.partitionBy("user_id", "sid").orderBy(*order)
    seq = sess.select(
        "event_type",
        F.lead("event_type").over(wse).alias("next_type"),
        F.row_number().over(wse).alias("rn"),
    )
    trans = seq.select(
        F.col("event_type").alias("from_type"),
        F.coalesce("next_type", F.lit("_end_")).alias("to_type"),
    ).unionByName(
        seq.filter(F.col("rn") == 1).select(
            F.lit("_start_").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
    )
    cnt = trans.groupBy("from_type", "to_type").agg(
        F.count("*").cast("bigint").alias("n_transitions")
    )
    return cnt


# Q2/Q20 analogs (r12): the two classic TPC-H shapes still missing from
# J7 — the per-group ARGMIN-then-join-back lookup (Q2's min-cost
# supplier; partsupp doesn't ship in this schema, so supply cost is the
# observed integer unit price from lineitem) and the
# share-of-group-total threshold semi-join (Q20's excess-stock rule as
# a shipped-quantity dominance test). Both all-integer end-to-end.
Q2_TOP = 100


@register(
    "cheapest_supplier_q2",
    oracle=f"""
    WITH eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
    ),
    unit AS (
      SELECT l_partkey AS pkey, l_suppkey AS skey,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // CAST(l_quantity AS BIGINT) AS unit_cents
      FROM lineitem JOIN eu ON s_suppkey = l_suppkey
    ),
    best AS (
      SELECT pkey, skey, unit_cents FROM (
        SELECT pkey, skey, unit_cents,
               row_number() OVER (PARTITION BY pkey
                                  ORDER BY unit_cents, skey) AS rn
        FROM unit) WHERE rn = 1
    )
    SELECT p_partkey, p_brand, p_type, s_name AS supplier, n_name AS nation,
           unit_cents AS unit_cost_cents
    FROM best
    JOIN part ON p_partkey = pkey
    JOIN eu ON s_suppkey = skey
    WHERE p_type = 'STANDARD'
    ORDER BY unit_cents, p_partkey LIMIT {Q2_TOP}
    """,
)
def cheapest_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): per STANDARD part, the
    cheapest EUROPE-region supplier by observed integer unit price —
    the per-group argmin THEN join-back-for-details lookup Q2's
    correlated subquery expresses (ref: no analog; J7 breadth). Unit
    price is an integer-defined metric (extendedprice cents div
    quantity — floor division, identical in both engines), the argmin
    is min(struct(unit_cents, suppkey)) — partial-aggregable, ties to
    the lower suppkey (Q2's deterministic tiebreak role), never a
    corpus-sorting window in the engine — and the report order
    (unit_cents, p_partkey) is an all-integer total order.

    Scale shape: supplier⋈nation⋈region collapses to a broadcast
    ~supplier-count row filter applied ON the lineitem scan; the argmin
    collapses map-side per part; the join-back sides are the part dim
    (key-partitioned) and the tiny supplier broadcast; the report is
    TakeOrderedAndProject."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    li = t(spark, sf_dir, "lineitem")
    unit = li.join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey")).select(
        F.col("l_partkey").alias("pkey"),
        F.col("l_suppkey").alias("skey"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_cents"),
    )
    best = (
        unit.select(
            "pkey", F.struct("unit_cents", F.col("skey")).alias("us")
        )
        .groupBy("pkey")
        .agg(F.min("us").alias("best"))
        .select(
            "pkey",
            F.col("best.unit_cents").alias("unit_cost_cents"),
            F.col("best.skey").alias("skey"),
        )
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        best.join(p, F.col("p_partkey") == F.col("pkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("skey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            "unit_cost_cents",
        )
        .orderBy("unit_cost_cents", "p_partkey")
        .limit(Q2_TOP)
    )


@register(
    "promo_stock_suppliers_q20",
    oracle="""
    WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    sp AS (
      SELECT l_suppkey AS skey, l_partkey AS pkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
      FROM lineitem JOIN promo ON p_partkey = l_partkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT skey, pkey, qty_sp,
             CAST(sum(qty_sp) OVER (PARTITION BY pkey) AS BIGINT) AS qty_p
      FROM sp
    ),
    dom AS (SELECT skey, pkey, qty_sp, qty_p FROM tot WHERE 8 * qty_sp > qty_p)
    SELECT s_name AS supplier, n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_dominated_parts,
           CAST(sum(qty_sp) AS BIGINT) AS dominated_qty
    FROM dom
    JOIN supplier ON s_suppkey = skey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY s_name, n_name
    """,
)
def promo_stock_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock threshold semi-join): suppliers
    whose shipped share of a PROMO part is CONCENTRATED — more than an
    eighth of that part's total shipped quantity, ~2x the fair share
    at this schema's ~16 suppliers per part (Q20's
    availqty > 0.5 * sum(qty) threshold rule re-expressed over
    observed shipments; partsupp doesn't ship in this schema, and a
    strict majority never occurs in the synthetic data — measured 0
    pairs at every SF, so the 1/8 threshold is what keeps the check
    non-vacuous: 123/51/71 flagged pairs at sf0.001/0.01/0.1) — with
    how many parts each supplier concentrates and the concentrated
    quantity. The share-of-group-total threshold is the division-free
    integer compare 8 * qty_sp > qty_p (the curriculum 4*cum >= q*n
    device), so the surviving set is engine-identical.

    Scale shape: the PROMO filter broadcasts into the lineitem scan;
    per-(supplier, part) quantities are one partial-aggregable
    groupBy; part totals come from a window over THAT collapsed table
    (partitions = suppliers-per-part, bounded — never a second corpus
    pass, the one-corpus-pass scalar rule); the supplier/nation
    decorations are broadcasts on a suppliers-sized frame."""
    promo = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem")
    sp = (
        li.join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("l_suppkey").alias("skey"), F.col("l_partkey").alias("pkey")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty_sp")
        )
    )
    w = Window.partitionBy("pkey")
    dom = (
        sp.withColumn("qty_p", F.sum("qty_sp").over(w).cast("bigint"))
        .filter(8 * F.col("qty_sp") > F.col("qty_p"))
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        dom.join(F.broadcast(s), F.col("s_suppkey") == F.col("skey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_dominated_parts"),
            F.sum("qty_sp").cast("bigint").alias("dominated_qty"),
        )
    )


# Markov removal-effect attribution (r12): the standard multi-touch
# attribution model (Anderl et al. 2014) on top of the transition
# matrix — a channel's credit is how much CONVERSION disappears when
# journeys can no longer pass through it. Exact-integer absorption
# walk: 2^40 micro-units of mass start at _start_ and flow K steps
# along the counted transition edges (per-edge floor division — the
# graph_pagerank integer-mass device), with `purchase` (conversion)
# and `_end_` absorbing; the removal walk for channel c additionally
# absorbs (discards) mass entering c. Every quantity BIGINT until the
# two guarded edge divisions, so the whole 5-walk computation
# hash-checks against a DuckDB unrolled-CTE oracle riding the SAME
# _MARKOV_CNT_CTES count derivation as the transition matrix.
# Exact-range note (r13, ADVICE r12): the oracle's per-edge product
# m * n_transitions is computed in HUGEINT — with _ATTR_MASS = 2^40,
# a BIGINT product overflows 2^63 once any edge count reaches ~2^23
# while its source state still holds near-full mass (reachable at
# large SFs); DuckDB BIGINT*BIGINT raises, it does not promote. The
# per-state mass after the floor division is always <= _ATTR_MASS, so
# the CAST back to BIGINT is exact at every scale. The Python engine
# walk is arbitrary-precision and needs no guard.
_ATTR_CONV = "purchase"
# the removable channels — pinned to the testdata's non-conversion
# event types by tests/test_corpus_laws.py (the funnel-twin
# literal-constant device: the oracle SQL needs literals)
_ATTR_CHANNELS = ("click", "error", "signup", "view")
_ATTR_STEPS = 16
_ATTR_MASS = 1 << 40


def _attr_walk_sql(tag: str, absorbing: tuple[str, ...]) -> str:
    """The K-step unrolled walk CTE chain for one absorbing set. Each
    step is AS MATERIALIZED (referenced by the next step AND the conv
    union — without the hint DuckDB re-inlines the whole prefix per
    reference, the eval_rq_recall lesson)."""
    absorb = ", ".join(f"'{a}'" for a in absorbing)
    ctes = [f"{tag}s0 AS (SELECT '_start_' AS state, CAST({_ATTR_MASS} AS BIGINT) AS m)"]
    for i in range(1, _ATTR_STEPS + 1):
        ctes.append(f"""{tag}s{i} AS MATERIALIZED (
      SELECT cnt.to_type AS state,
             CAST(sum(CAST(s.m AS HUGEINT) * cnt.n_transitions // t.from_total) AS BIGINT) AS m
      FROM {tag}s{i - 1} s
      JOIN cnt ON cnt.from_type = s.state
      JOIN tot t ON t.from_type = s.state
      WHERE s.state NOT IN ({absorb})
      GROUP BY cnt.to_type
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT m FROM {tag}s{i} WHERE state = '{_ATTR_CONV}'"
        for i in range(1, _ATTR_STEPS + 1)
    )
    ctes.append(
        f"{tag}conv AS (SELECT CAST(coalesce(sum(m), 0) AS BIGINT) AS conv "
        f"FROM ({union}))"
    )
    return ",\n    ".join(ctes)


def _attr_oracle() -> str:
    base_absorb = (_ATTR_CONV, "_end_")
    walks = [_attr_walk_sql("wb", base_absorb)]
    removed_rows = []
    for i, ch in enumerate(_ATTR_CHANNELS):
        walks.append(_attr_walk_sql(f"w{i}", base_absorb + (ch,)))
        removed_rows.append(
            f"SELECT '{ch}' AS channel, (SELECT conv FROM w{i}conv) AS conv_removed"
        )
    removed = "\n      UNION ALL ".join(removed_rows)
    walks_sql = ",\n    ".join(walks)
    return f"""
    WITH {_MARKOV_CNT_CTES},
    {walks_sql},
    removed AS (
      {removed}
    ),
    final AS (
      SELECT channel, (SELECT conv FROM wbconv) AS conv_base, conv_removed
      FROM removed
    )
    SELECT channel, conv_base, conv_removed,
           conv_base - conv_removed AS removed_delta,
           CASE WHEN conv_base > 0
                THEN CAST(conv_base - conv_removed AS DOUBLE) / conv_base
           END AS removal_effect,
           CASE WHEN sum(conv_base - conv_removed) OVER () > 0
                THEN CAST(conv_base - conv_removed AS DOUBLE)
                     / sum(conv_base - conv_removed) OVER ()
           END AS attribution_share
    FROM final
    """


def _attr_walk(cnt: dict, tot: dict, absorbing: set) -> int:
    """Pure-integer K-step absorption walk over the counted edges;
    returns the mass absorbed at the conversion state."""
    conv = 0
    moving = {"_start_": _ATTR_MASS}
    edges: dict = {}
    for (u, v), n in cnt.items():
        edges.setdefault(u, []).append((v, n))
    for _ in range(_ATTR_STEPS):
        nxt: dict = {}
        for u, mu in moving.items():
            if u in absorbing or mu <= 0 or u not in tot:
                continue
            tu = tot[u]
            for v, n in edges.get(u, ()):
                nxt[v] = nxt.get(v, 0) + mu * n // tu
        conv += nxt.get(_ATTR_CONV, 0)
        moving = {v: m for v, m in nxt.items() if v not in absorbing}
    return conv


@register("events_attribution_markov", oracle=_attr_oracle())
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect multi-touch attribution (section comment
    above): per non-conversion channel, conversion mass of the base
    chain vs the chain with that channel removed (absorbed-and-
    discarded), the removal effect 1 - conv_removed/conv_base, and
    the normalized attribution share — the model that replaces
    last-touch heuristics in funnel analysis, built directly on
    events_markov_transitions' counted chain.

    Determinism: the walk is exact integer mass (per-edge floor
    division, K={_ATTR_STEPS} truncation — per-step floor leakage is
    bounded by the edge count and replayed identically in both
    engines); the two output divisions are guarded doubles of
    identical BIGINTs.

    Scale shape: the data-scale work — sessionization windows + the
    (types+2)^2 transition count — is the distributed lineage shared
    with events_markov_transitions; the walk itself runs on the
    collected <= (types+2)^2-row count matrix (bounded iterative
    driver state, the kmeans/codebook precedent — a 7-state chain IS
    driver state by any honest design), and the 4-row report is a
    driver-created frame. Removing a channel never requires
    re-counting: all five walks share one matrix."""
    cnt_rows = _markov_counts(spark, sf_dir).collect()
    cnt = {(r.from_type, r.to_type): int(r.n_transitions) for r in cnt_rows}
    tot: dict = {}
    for (u, _v), n in cnt.items():
        tot[u] = tot.get(u, 0) + n
    base_absorb = {_ATTR_CONV, "_end_"}
    conv_base = _attr_walk(cnt, tot, base_absorb)
    rows = []
    deltas = []
    for ch in _ATTR_CHANNELS:
        conv_removed = _attr_walk(cnt, tot, base_absorb | {ch})
        deltas.append(conv_base - conv_removed)
        rows.append((ch, conv_base, conv_removed, conv_base - conv_removed))
    total_delta = sum(deltas)
    out = [
        (
            ch,
            cb,
            cr,
            d,
            (float(d) / cb) if cb > 0 else None,
            (float(d) / total_delta) if total_delta > 0 else None,
        )
        for (ch, cb, cr, d) in rows
    ]
    return spark.createDataFrame(
        out,
        "channel string, conv_base long, conv_removed long, "
        "removed_delta long, removal_effect double, attribution_share double",
    )
