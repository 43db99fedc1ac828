"""Layer-B analytics + oracle-checkable Layer-A operators (SURVEY §2, 📊 rows
A6-A9, W4, O4, J7 and ⚙ rows P1/P5/P6, A1/A3, W1, O1, J2/J4 re-expressed
over the driver's testdata so DuckDB can verify them).

The metadata-side inputs (commit timelines) are synthesized
deterministically from `orders` inside the query itself — identical
projection in the Spark plan and the oracle SQL — so Layer-A semantics
(parse, completeness, batching, checkpoint filters) are hash-checkable.

Scale notes (100 TB):
- every aggregate here is a partial-aggregable groupBy (map-side combine
  free via Catalyst); no collects, no Python in the row path
- the star joins broadcast the dimension side (region/nation/customer at
  any SF vs lineitem facts); Catalyst + AQE pick broadcast automatically
  under the session threshold
- window functions partition by bounded keys (file_group, partition,
  day) — no single-partition global windows except the tiny trend series
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeview_spark.functions.ids import uuid3_expr
from lakeview_spark.functions.instants import parse_instants
from lakeview_spark.plans.registry import events_ts_us, register, t


def _dec(c) -> F.Column:
    return (c if not isinstance(c, str) else F.col(c)).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# synthesized commit timeline (shared by the Layer-A oracle queries)

_TF_SQL = """
    SELECT CAST(o_orderkey AS VARCHAR) || '.commit.requested' AS filename FROM orders
    UNION ALL
    SELECT CAST(o_orderkey AS VARCHAR) || '.inflight' FROM orders
    UNION ALL
    SELECT CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_orderkey AS VARCHAR) || '_' || CAST(o_orderkey + 1 AS VARCHAR) || '.commit'
                ELSE CAST(o_orderkey AS VARCHAR) || '.commit' END
    FROM orders WHERE o_orderstatus <> 'O'
"""


def _timeline_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_orderkey").alias("okey"),
        "o_orderstatus",
    )
    req = o.select(F.concat("k", F.lit(".commit.requested")).alias("filename"))
    inf = o.select(F.concat("k", F.lit(".inflight")).alias("filename"))
    com = o.filter(F.col("o_orderstatus") != "O").select(
        F.when(
            F.col("o_orderstatus") == "F",
            F.concat("k", F.lit("_"), (F.col("okey") + 1).cast("string"), F.lit(".commit")),
        )
        .otherwise(F.concat("k", F.lit(".commit")))
        .alias("filename")
    )
    return req.unionByName(inf).unionByName(com)


_PARSE_SQL_BODY = """
    SELECT
      filename,
      CASE WHEN contains(p[1], '_') THEN string_split(p[1], '_')[1] ELSE p[1] END AS ts_str,
      CASE WHEN contains(p[1], '_') THEN string_split(p[1], '_')[2] END AS completion_ts,
      CASE WHEN len(p) = 2 AND p[2] = 'inflight' THEN 'commit' ELSE p[2] END AS action,
      CASE WHEN len(p) = 2 AND p[2] = 'inflight' THEN 'inflight'
           WHEN len(p) = 3 THEN p[3] ELSE 'completed' END AS state
    FROM (SELECT filename, string_split(filename, '.') AS p FROM tf)
"""


@register(
    "timeline_parse",
    oracle=f"WITH tf AS ({_TF_SQL}) {_PARSE_SQL_BODY}",
)
def timeline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: instant-filename parse, pure columnar (no UDF)."""
    return parse_instants(_timeline_files(spark, sf_dir)).select(
        "filename", "ts_str", "completion_ts", "action", "state"
    )


@register(
    "timeline_completeness",
    oracle=f"""
    WITH tf AS ({_TF_SQL}), inst AS ({_PARSE_SQL_BODY})
    SELECT ts_str,
           (bool_or(state = 'requested') AND bool_or(state = 'inflight')
            AND bool_or(state = 'completed')) AS is_complete,
           count(*) AS n_files
    FROM inst GROUP BY ts_str
    """,
)
def timeline_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: commit-completeness agg — groupBy ts, state-set coverage.

    The scan side goes through spread_unsplittable on the aggregation
    key (r14, guide §2.5): the synthesized timeline is three branches
    of one unsplittable file, so the whole filename parse ran on three
    tasks. Only the cheap ts_str split is computed below the exchange
    (it IS the partition key); the full parse and the state votes run
    on every core above it, and the groupBy's own exchange is elided
    (same key). bool_or/count are order-free, so rows are identical.
    Only `state` is derived above the exchange — re-running the full
    parse there would mint a NEW ts_str attribute and Spark would no
    longer know the data is already partitioned by it (a second
    exchange appeared in the first cut's plan; PLANS.md caught it)."""
    from lakeview_spark.functions.instants import state_col, ts_str_col
    from lakeview_spark.operators.scale import spread_unsplittable

    tf = _timeline_files(spark, sf_dir).withColumn(
        "ts_str", ts_str_col(F.col("filename"))
    )
    inst = spread_unsplittable(tf, "ts_str").withColumn(
        "state", state_col(F.col("filename"))
    )
    return inst.groupBy("ts_str").agg(
        (
            F.bool_or(F.col("state") == "requested")
            & F.bool_or(F.col("state") == "inflight")
            & F.bool_or(F.col("state") == "completed")
        ).alias("is_complete"),
        F.count("*").alias("n_files"),
    )


@register(
    "first_incomplete_commit",
    oracle=f"""
    WITH tf AS ({_TF_SQL}), inst AS ({_PARSE_SQL_BODY}),
    g AS (
      SELECT ts_str,
             (bool_or(state = 'requested') AND bool_or(state = 'inflight')
              AND bool_or(state = 'completed')) AS is_complete
      FROM inst GROUP BY ts_str
    )
    SELECT CAST(min(CAST(ts_str AS BIGINT)) - 1 AS VARCHAR) AS first_incomplete
    FROM g WHERE NOT is_complete
    """,
)
def first_incomplete_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: CONTINUE-mode resume point = min(incomplete ts) - 1."""
    g = timeline_completeness(spark, sf_dir)
    return g.filter(~F.col("is_complete")).agg(
        (F.min(F.col("ts_str").cast("bigint")) - 1).cast("string").alias("first_incomplete")
    )


@register(
    "checkpoint_filter",
    oracle=f"""
    WITH tf AS ({_TF_SQL})
    SELECT filename,
           CAST(string_split(string_split(filename, '.')[1], '_')[1] AS BIGINT) AS commit_id
    FROM tf
    WHERE regexp_full_match(filename, '\\d+(_\\d+)?(\\.[a-z]{{1,20}}){{1,2}}')
      AND CAST(string_split(string_split(filename, '.')[1], '_')[1] AS BIGINT) > 7500
    """,
)
def checkpoint_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P3: instant-pattern + already-uploaded (commit_id > checkpoint)
    filter — the columnar predicates Catalyst pushes to the scan."""
    from lakeview_spark.constants import ACTIVE_COMMIT_INSTANT_PATTERN, full_match

    tf = _timeline_files(spark, sf_dir)
    cid = F.split(F.split("filename", r"\.", 2)[0], "_", 2)[0].try_cast("bigint")
    return (
        tf.filter(F.col("filename").rlike(full_match(ACTIVE_COMMIT_INSTANT_PATTERN)))
        .withColumn("commit_id", cid)
        .filter(F.col("commit_id") > 7500)
        .select("filename", "commit_id")
    )


@register(
    "instant_sort_order",
    oracle=f"""
    WITH tf AS (
      {_TF_SQL}
      UNION ALL SELECT 'hoodie.properties'
    )
    SELECT filename,
           row_number() OVER (ORDER BY (filename = 'hoodie.properties') DESC, filename) AS sort_rank
    FROM tf WHERE filename <= '11' OR filename = 'hoodie.properties'
    """,
)
def instant_sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: active-timeline sort — hoodie.properties first, then
    lexicographic (small slice so the global window is cheap)."""
    tf = _timeline_files(spark, sf_dir).unionByName(
        spark.range(1).select(F.lit("hoodie.properties").alias("filename"))
    )
    tf = tf.filter((F.col("filename") <= "11") | (F.col("filename") == "hoodie.properties"))
    w = Window.orderBy(
        (F.col("filename") == "hoodie.properties").desc(), F.col("filename")
    )
    return tf.withColumn("sort_rank", F.row_number().over(w))


@register(
    "archived_batching",
    oracle="""
    WITH af AS (
      SELECT '.commits_.archive.' || CAST(s_suppkey AS VARCHAR) || '_0-0-0' AS filename,
             s_suppkey AS archive_num
      FROM supplier
    )
    SELECT filename, archive_num,
           CAST(floor((row_number() OVER (ORDER BY archive_num) - 1) / 2) AS INT) + 1 AS batch_id,
           CAST((row_number() OVER (ORDER BY archive_num) - 1) % 2 AS INT) AS seq_in_batch
    FROM af
    """,
)
def archived_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (archived): uniform batch packing of single-file groups —
    floor((row_number-1)/batch_size) over the numeric archive sort (O2)."""
    af = t(spark, sf_dir, "supplier").select(
        F.concat(F.lit(".commits_.archive."), F.col("s_suppkey").cast("string"), F.lit("_0-0-0")).alias(
            "filename"
        ),
        F.col("s_suppkey").alias("archive_num"),
    )
    w = Window.orderBy("archive_num")
    rn = F.row_number().over(w)
    return af.select(
        "filename",
        "archive_num",
        (F.floor((rn - 1) / 2).cast("int") + 1).alias("batch_id"),
        ((rn - 1) % 2).cast("int").alias("seq_in_batch"),
    )


@register(
    "new_table_detection",
    oracle="""
    SELECT s_suppkey AS table_num, s_name AS table_name
    FROM supplier
    WHERE s_suppkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey <= 40)
    """,
)
def new_table_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti join — tables without a checkpoint get initialized."""
    tables = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("table_num"), F.col("s_name").alias("table_name")
    )
    ckpts = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 40)
        .select(F.col("c_custkey").alias("table_num"))
    )
    return tables.join(F.broadcast(ckpts), "table_num", "left_anti")


@register(
    "manifest_diff",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) || '.parquet' AS fileName
    FROM part WHERE p_partkey < 1500
      AND p_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey < 1000)
    """,
)
def manifest_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: LSM manifest snapshot diff as an anti join on fileName."""
    part = t(spark, sf_dir, "part")
    cur = part.filter(F.col("p_partkey") < 1500).select(
        F.concat(F.col("p_partkey").cast("string"), F.lit(".parquet")).alias("fileName")
    )
    prev = part.filter(F.col("p_partkey") < 1000).select(
        F.concat(F.col("p_partkey").cast("string"), F.lit(".parquet")).alias("fileName")
    )
    return cur.join(prev, "fileName", "left_anti")


@register(
    "uuid3_table_ids",
    oracle="""
    WITH u AS (
      SELECT 's3://lake/db/tbl_' || CAST(s_suppkey AS VARCHAR) AS table_uri FROM supplier
    ), m AS (SELECT table_uri, md5(table_uri) AS h FROM u)
    SELECT table_uri,
           substr(h,1,8) || '-' || substr(h,9,4) || '-3' || substr(h,14,3) || '-' ||
           translate(substr(h,17,1), '0123456789abcdef', '89ab89ab89ab89ab') ||
           substr(h,18,3) || '-' || substr(h,21,12) AS table_id
    FROM m
    """,
)
def uuid3_table_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: deterministic UUIDv3 table ids, fully columnar (md5 + translate)."""
    u = t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s3://lake/db/tbl_"), F.col("s_suppkey").cast("string")).alias("table_uri")
    )
    return u.select("table_uri", uuid3_expr(F.col("table_uri")).alias("table_id"))


# ---------------------------------------------------------------------------
# Layer-B product analytics (README.md:299-344) over testdata


@register(
    "table_stats_daily",
    oracle="""
    SELECT o_custkey % 20 AS table_num,
           date_trunc('day', o_orderdate) AS day,
           count(*) AS commit_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bytes_written
    FROM orders GROUP BY 1, 2
    """,
)
def table_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: table size & update volume over time (commit series from orders)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        (F.col("o_custkey") % 20).alias("table_num"),
        F.date_trunc("day", "o_orderdate").alias("day"),
    ).agg(
        F.count("*").alias("commit_count"),
        F.sum(_dec("o_totalprice")).cast("double").alias("bytes_written"),
    )


_PARTS_SQL = """
    SELECT l_returnflag || '/' || l_linestatus AS partition_key,
           count(*) AS file_count,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_bytes
    FROM lineitem GROUP BY 1
"""


@register("partition_size_distribution", oracle=_PARTS_SQL)
def partition_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: partition size distribution (files = lineitems)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("partition_key")
    ).agg(
        F.count("*").alias("file_count"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_bytes"),
    )


@register(
    "partition_skew",
    oracle="""
    WITH p AS (
      SELECT l_returnflag || '/' || l_linestatus AS partition_key,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_dec
      FROM lineitem GROUP BY 1
    )
    SELECT partition_key,
           CAST(total_dec AS DOUBLE) AS total_bytes,
           CAST(total_dec * count(*) OVER () - sum(total_dec) OVER () AS DOUBLE)
             / CAST(sum(total_dec) OVER () AS DOUBLE) AS skew_vs_avg
    FROM p
    """,
)
def partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: data skew vs average partition size.

    skew = (x - avg) / avg is computed as (x*n - total) / total with x*n
    and total kept in exact DECIMAL until the final cast: an `avg() OVER`
    of doubles sums floats in partition order, which differs between
    Spark and DuckDB in the last ulp and (worse) between Spark runs —
    the round-1 pass of the double formulation was ordering luck."""
    li = t(spark, sf_dir, "lineitem")
    p = li.groupBy(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("partition_key")
    ).agg(F.sum(_dec("l_extendedprice")).alias("total_dec"))
    w = Window.partitionBy()
    grand = F.sum("total_dec").over(w)
    n = F.count("*").over(w)
    return p.select(
        "partition_key",
        F.col("total_dec").cast("double").alias("total_bytes"),
        (
            (F.col("total_dec") * n - grand).cast("double") / grand.cast("double")
        ).alias("skew_vs_avg"),
    )


@register(
    "file_size_percentiles",
    oracle="""
    SELECT l_returnflag || '/' || l_linestatus AS partition_key,
           round(quantile_cont(l_extendedprice, 0.1), 4) AS p10,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem GROUP BY 1
    """,
)
def file_size_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: file-size percentiles per partition (exact interpolated).

    ONE percentile(col, array(...)) call instead of three (r14, guide
    §2.3): percentile is a buffering aggregate — its partial state is
    the whole per-partition value multiset, so three separate calls
    built and SHUFFLED three copies of every value (measured 4.9–5.7 s
    under the noop sink vs ~1.7 s after; the count()-timed bench prunes
    the aggregates either way). One call sorts one buffer and reads all
    three ranks from it — same sorted multiset, same interpolation,
    bit-identical values."""
    li = t(spark, sf_dir, "lineitem")
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9)))
    return (
        li.groupBy(
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("partition_key")
        )
        .agg(pct.alias("_p"))
        .select(
            "partition_key",
            F.round(F.col("_p")[0], 4).alias("p10"),
            F.round(F.col("_p")[1], 4).alias("p50"),
            F.round(F.col("_p")[2], 4).alias("p90"),
        )
    )


@register(
    "partition_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket, count(*) AS file_count
    FROM lineitem GROUP BY 1
    """,
)
def partition_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: file-size histogram via bucketed groupBy."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / 5000).cast("bigint").alias("bucket")
    ).agg(F.count("*").alias("file_count"))


@register(
    "compaction_backlog",
    oracle="""
    WITH g AS (
      SELECT user_id % 100 AS file_group, epoch_us(ts) AS ts, event_type FROM events
    ), w AS (
      SELECT file_group, ts, event_type,
             max(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY file_group) AS last_compaction
      FROM g
    )
    SELECT file_group,
           count(CASE WHEN last_compaction IS NULL OR ts > last_compaction THEN 1 END) AS backlog_events,
           max(last_compaction) AS last_compaction_ts
    FROM w GROUP BY file_group
    """,
)
def compaction_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per file group, events since the last compaction (purchase ~
    compaction commit; clicks/views ~ log files).

    events.ts arrives as micros via events_ts_us (dtype-dispatched);
    DuckDB's TIMESTAMP is already micros (epoch_us) — exact integer
    compares on both sides."""
    ev = t(spark, sf_dir, "events")
    e = ev.select(
        (F.col("user_id") % 100).alias("file_group"),
        events_ts_us(ev).alias("ts"),
        "event_type",
    )
    w = Window.partitionBy("file_group")
    e = e.withColumn(
        "last_compaction",
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return e.groupBy("file_group").agg(
        F.count(
            F.when(
                F.col("last_compaction").isNull() | (F.col("ts") > F.col("last_compaction")), 1
            )
        ).alias("backlog_events"),
        F.max("last_compaction").alias("last_compaction_ts"),
    )


@register(
    "table_counts_rollup",
    oracle="""
    SELECT r_name AS lake, n_name AS database, count(*) AS table_count
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def table_counts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: lake -> database -> table totals via rollup (tables = customers)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup(
        F.col("r_name").alias("lake"), F.col("n_name").alias("database")
    ).agg(F.count("*").alias("table_count"))


@register(
    "timeline_trends",
    oracle="""
    WITH d AS (
      SELECT epoch_us(ts) // 86400000000 AS day_num, count(*) AS events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1
    )
    SELECT day_num, events, total_value,
           events - lag(events, 1) OVER (ORDER BY day_num) AS dod_delta,
           events - lag(events, 7) OVER (ORDER BY day_num) AS wow_delta
    FROM d
    """,
)
def timeline_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: ordered timeline history with day-over-day / week-over-week
    deltas. Day bucket = integer div of the micros timestamp."""
    ev = t(spark, sf_dir, "events")
    e = ev.withColumn("ts_us", events_ts_us(ev))
    d = e.groupBy(F.expr("ts_us div 86400000000").alias("day_num")).agg(
        F.count("*").alias("events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )
    w = Window.orderBy("day_num")
    return d.select(
        "day_num",
        "events",
        "total_value",
        (F.col("events") - F.lag("events", 1).over(w)).alias("dod_delta"),
        (F.col("events") - F.lag("events", 7).over(w)).alias("wow_delta"),
    )


@register(
    "top_partitions",
    oracle=f"""
    WITH p AS ({_PARTS_SQL})
    SELECT partition_key, total_bytes, file_count
    FROM p ORDER BY total_bytes DESC, partition_key LIMIT 10
    """,
)
def top_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: top-N partitions by size (deterministic tiebreak)."""
    p = partition_size_distribution(spark, sf_dir)
    return p.select("partition_key", "total_bytes", "file_count").orderBy(
        F.desc("total_bytes"), "partition_key"
    ).limit(10)


# ---------------------------------------------------------------------------
# star-schema joins (J7) — the flagship TPC-H-shaped queries


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide partial-aggregable scan (the bench headline).

    The 2^53 edge rule (found by the r8 sf1 oracle sweep): the
    DECIMAL-exact sums agreed bit-for-bit across engines at 10x, but
    the scale-6 charge sum's UNSCALED value (4.4e16) exceeds 2^53, and
    DuckDB's int128-decimal -> double conversion double-rounds there
    while Spark's BigDecimal path rounds correctly — a genuine 1-ulp
    cross-engine divergence. Money sums therefore ROUND to their
    natural scale 2 BEFORE the double edge cast (identical ROUND in
    both engines), keeping the unscaled value single-rounding-safe up
    to ~$90T per group."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    )
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc * (F.lit(1) + _dec("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact ⋈ two dims, top-K by aggregated revenue."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    # spread the unsplittable fact scan on the aggregation key (r14,
    # guide §2.5): the broadcast joins preserve the partitioning, so
    # the groupBy's exchange is elided — still one exchange, moved
    # below the join+revenue kernel, which then runs on every core.
    # DECIMAL sums are exact in any order, so rows are identical.
    from lakeview_spark.operators.scale import spread_unsplittable

    li = spread_unsplittable(
        li.select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name AS nation,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           count(*) AS lineitem_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way star join with the region predicate
    pushed down the dim chain — region('ASIA') ⋈ nation ⋈ customer is
    reduced FIRST (two tiny broadcast joins), so the fact join
    broadcasts a ~1/|regions| customer slice and the post-fact plan has
    no trailing nation/region joins at all (r04 verdict item 4)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c_asia = c.join(F.broadcast(n_asia), c.c_nationkey == n_asia.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c_asia), o.o_custkey == c_asia.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("lineitem_count"),
    )


@register(
    "region_segment_profile",
    oracle="""
    SELECT r_name AS region, c_mktsegment AS segment,
           count(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, c_mktsegment
    """,
)
def region_segment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: star join orders ⋈ customer ⋈ nation ⋈ region."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count("*").alias("order_count"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Z-order layout telemetry (r9): the registered, oracle-checkable twin
# of operators/maintenance.py's zorder_write + file_pruning_stats. The
# fs-based rewrite is pytest-proven; this query measures WHY the layout
# wins, in-plan: bucket events 1024 ways under (a) the Morton code of
# (user_id, event time) and (b) plain time order, and report each
# bucket's bounding box. A min/max-pruning scan reads a bucket iff the
# query box intersects its bounding box, so smaller boxes == fewer
# files read for multi-dimensional predicates.
_Z_BITS = 16


def _z_interleave_sql(cols: list[str], bits: int) -> str:
    """The SQL text of operators/maintenance.py:_interleave — bit i of
    dimension d lands at position i * n_dims + d."""
    n = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * n + d})"
        for d, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH e AS (SELECT user_id AS u, epoch_us(ts) AS v FROM events),
    rng AS (
      SELECT min(u) AS umn, max(u) AS umx, min(v) AS vmn, max(v) AS vmx FROM e
    ),
    nrm AS (
      SELECT ((u - umn) * 65535) // greatest(umx - umn, 1) AS nu,
             ((v - vmn) * 65535) // greatest(vmx - vmn, 1) AS nv
      FROM e, rng
    ),
    coded AS (SELECT nu, nv, {_z_interleave_sql(["nu", "nv"], _Z_BITS)} AS z FROM nrm),
    stream AS (
      SELECT 'zorder' AS layout, z // 4194304 AS bucket, nu, nv FROM coded
      UNION ALL
      SELECT 'linear' AS layout, nv // 64 AS bucket, nu, nv FROM coded
    )
    SELECT layout, bucket, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(max(nu) - min(nu) AS BIGINT) AS u_span,
           CAST(max(nv) - min(nv) AS BIGINT) AS v_span
    FROM stream GROUP BY 1, 2
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket bounding boxes under z-order vs time-linear layout —
    the scan-pruning telemetry behind OPTIMIZE ZORDER (see module
    comment). Both dimensions are range-normalized to 16 bits with the
    1-row min/max broadcast (integer multiply/div — the
    approxQuantile-free normalization the maintenance writer documents
    for 100 TB), the Morton code is pure bit shifts (whole-stage
    codegen), and both layouts' buckets come from ONE pass via the
    explode device (a self-union would re-execute the scan lineage,
    the recompute class corpus_heavy_hitters_cms documents). Spans are
    exact integers; no float anywhere.

    Reading: mean box AREA is layout-invariant (1024 buckets partition
    the same 65536^2 space either way) — the win is the SHAPE. Under
    'linear', v_span is ~64 but u_span covers the whole user range, so
    a user-constrained query reads every bucket; under 'zorder' both
    spans sit near 2048 (the square cell), so a query box constrained
    in BOTH dimensions intersects ~(box/2048 + 1)^2 buckets instead of
    box/64 + 1 full-width stripes — the multi-dimensional pruning
    win the pytest measures with a concrete 4096^2 box."""
    from lakeview_spark.operators.maintenance import _interleave

    e = t(spark, sf_dir, "events")
    base = e.select(F.col("user_id").alias("u"), events_ts_us(e).alias("v"))
    rng = base.agg(
        F.min("u").alias("umn"),
        F.max("u").alias("umx"),
        F.min("v").alias("vmn"),
        F.max("v").alias("vmx"),
    )
    nrm = base.crossJoin(F.broadcast(rng)).select(
        F.expr("((u - umn) * 65535) div greatest(umx - umn, 1)").alias("nu"),
        F.expr("((v - vmn) * 65535) div greatest(vmx - vmn, 1)").alias("nv"),
    )
    coded = nrm.withColumn("z", _interleave(["nu", "nv"], _Z_BITS))
    buckets = F.array(
        F.struct(
            F.lit("zorder").alias("layout"),
            F.expr("z div 4194304").alias("bucket"),
        ),
        F.struct(
            F.lit("linear").alias("layout"),
            F.expr("nv div 64").alias("bucket"),
        ),
    )
    stream = coded.select(F.explode(buckets).alias("lb"), "nu", "nv").select(
        F.col("lb.layout").alias("layout"),
        F.col("lb.bucket").alias("bucket"),
        "nu",
        "nv",
    )
    return stream.groupBy("layout", "bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (F.max("nu") - F.min("nu")).cast("bigint").alias("u_span"),
        (F.max("nv") - F.min("nv")).cast("bigint").alias("v_span"),
    )
