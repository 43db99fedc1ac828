"""Coverage queries for the remaining SURVEY §2 operator rows: A2
(group-with-any-recent filter), J3 (duplicate-wins join), U1
(union+dedup), O3 (exactly-one guard), and rows-only entries for the
two genuinely sequential operators (W1 greedy packing, W2 checkpoint
lookback) that the driver checks as rows-only (no SQL oracle exists
for order-dependent greedy packing)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lakeview_spark.operators.batcher import BLOCK, batch_instants
from lakeview_spark.plans.analytics import _TF_SQL, _timeline_files
from lakeview_spark.plans.registry import register, t


@register(
    "recent_commit_groups",
    oracle=f"""
    WITH tf AS ({_TF_SQL}),
    f AS (
      SELECT tf.filename,
             string_split(string_split(tf.filename, '.')[1], '_')[1] AS ts_str
      FROM tf
    ),
    lm AS (
      SELECT f.filename, f.ts_str, o.o_orderdate AS last_modified
      FROM f JOIN orders o ON f.ts_str = CAST(o.o_orderkey AS VARCHAR)
    )
    SELECT filename, ts_str FROM (
      SELECT filename, ts_str,
             max(last_modified) OVER (PARTITION BY ts_str) AS grp_max
      FROM lm
    ) WHERE grp_max > TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def recent_commit_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: CONTINUE-mode recency filter — keep a commit group if ANY
    member is newer than the checkpoint watermark (window max per
    group, no second scan)."""
    tf = _timeline_files(spark, sf_dir).withColumn(
        "ts_str", F.split(F.split("filename", r"\.", 2)[0], "_", 2)[0]
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("ts_str"),
        F.col("o_orderdate").alias("last_modified"),
    )
    lm = tf.join(o, "ts_str")
    grp_max = F.max("last_modified").over(Window.partitionBy("ts_str"))
    return (
        lm.withColumn("grp_max", grp_max)
        .filter(F.col("grp_max") > F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("filename", "ts_str")
    )


@register(
    "duplicate_wins_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def duplicate_wins_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: duplicate-key resolution keeping the last writer —
    row_number() = 1 over a descending order (the reference's
    toMap(merge: keep-last) rule)."""
    li = t(spark, sf_dir, "lineitem")
    # total order: (linenumber, partkey, suppkey) is unique per order —
    # row_number over a non-total order is engine-dependent
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_linenumber"), F.desc("l_partkey"), F.desc("l_suppkey")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@register(
    "union_dedup_discovery",
    oracle="""
    SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100
    UNION
    SELECT c_custkey, c_name FROM customer WHERE c_custkey BETWEEN 50 AND 150
    """,
)
def union_dedup_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: per-path discovery union with value-equality dedup
    (overlapping base paths rediscover the same tables)."""
    c = t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") <= 100).select("c_custkey", "c_name")
    b = c.filter(F.col("c_custkey").between(50, 150)).select("c_custkey", "c_name")
    return a.unionByName(b).dropDuplicates(["c_custkey", "c_name"])


@register(
    "exactly_one_guard",
    oracle="""
    SELECT s_nationkey AS nation_key, count(*) AS supplier_count
    FROM supplier GROUP BY s_nationkey HAVING count(*) = 1
    """,
)
def exactly_one_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: `path#tableId` requires exactly one discovered table —
    groupBy + HAVING count = 1."""
    s = t(spark, sf_dir, "supplier")
    return (
        s.groupBy(F.col("s_nationkey").alias("nation_key"))
        .agg(F.count("*").alias("supplier_count"))
        .filter(F.col("supplier_count") == 1)
    )


def _synthesized_multi_table_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table timelines from orders: table = o_custkey % 5, commit ts
    = o_orderkey; incomplete when status 'O' (no completed file)."""
    files = _timeline_files(spark, sf_dir).withColumn(
        "ts_str", F.split(F.split("filename", r"\.", 2)[0], "_", 2)[0]
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("ts_str"),
        F.concat(F.lit("tbl_"), (F.col("o_custkey") % 5).cast("string")).alias("table_id"),
        F.col("o_orderdate").alias("last_modified"),
    )
    return files.join(o, "ts_str").select("table_id", "filename", "last_modified")


@register("active_batch_packing")  # rows-only: greedy packing is order-dependent
def active_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (active): exact greedy commit-group packing per table via the
    batch engine (applyInPandas). No SQL oracle exists — the packing is
    inherently sequential — so the driver records the rows-only check;
    semantic parity is covered by the table-driven batcher tests.

    CONTINUE strategy: the synthesized timeline has incomplete commits
    (status-'O' orders) scattered from the earliest ids, so BLOCK would
    stop at the first one and emit ~nothing — CONTINUE skips them and
    packs every complete group (and exercises the skip arithmetic).

    The packed batch table is materialized once per (session, dataset):
    the inherently-sequential per-table Python packer is the expensive
    stage, and checkpoint_lookback starts from the same batches."""
    return _continue_batches(spark, sf_dir)


def _continue_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeview_spark.operators.materialize import materialized

    def build(s: SparkSession, d: str) -> DataFrame:
        from lakeview_spark.operators.batcher import CONTINUE

        files = _synthesized_multi_table_timeline(s, d)
        return batch_instants(files, max_batch_size=20, strategy=CONTINUE)

    return materialized(spark, "active_batches", sf_dir, build)


@register("checkpoint_lookback")  # rows-only: case-ladder over batch tails
def checkpoint_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-table checkpoint advance after batching — last-uploaded
    file via the savepoint/rollback lookback rules + watermark."""
    from lakeview_spark.runner import compute_checkpoint_updates
    from lakeview_spark.schemas import CHECKPOINTS_SCHEMA

    files = _synthesized_multi_table_timeline(spark, sf_dir)
    batches = _continue_batches(spark, sf_dir)
    empty_ckpts = spark.createDataFrame([], CHECKPOINTS_SCHEMA)
    return compute_checkpoint_updates(batches, files, empty_ckpts, "active").select(
        "table_id", "batch_id", "last_uploaded_file", "first_incomplete_commit_file"
    )
