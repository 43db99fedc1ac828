"""Coverage queries for the remaining SURVEY §2 operator rows: A2
(group-with-any-recent filter), J3 (duplicate-wins join), U1
(union+dedup), O3 (exactly-one guard), and the two sequential
operators (W1 greedy packing, W2 checkpoint lookback) — hash-checked
since r8 via a closed-form windowed replay of the greedy walk (see
_BATCH_CTE below for the proof sketch)."""

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


# table count for the synthesized multi-table timeline. Was 5 through
# r7 — which serialized the benched applyInPandas packer on 5 of 32
# local cores and made each per-table walk 10x longer than it needed
# to be (a local-bench artifact: real active timelines are O(100)
# files across MANY tables; the parallel-across-tables axis is the one
# that scales). 50 = the reference's own tables-per-batch hard cap
# (MetadataExtractorConstants.java:42-46).
_N_TABLES = 50


def _synthesized_multi_table_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table timelines from orders: table = o_custkey % _N_TABLES,
    commit ts = o_orderkey; incomplete when status 'O' (no completed
    file)."""
    files = _timeline_files(spark, sf_dir).withColumn(
        "ts_str", F.split(F.split("filename", r"\.", 2)[0], "_", 2)[0]
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("ts_str"),
        F.concat(F.lit("tbl_"), (F.col("o_custkey") % _N_TABLES).cast("string")).alias("table_id"),
        F.col("o_orderdate").alias("last_modified"),
    )
    return files.join(o, "ts_str").select("table_id", "filename", "last_modified")


# Closed-form windowed replay of the greedy CONTINUE walk
# (ActiveTimelineInstantBatcher.java:44-184) on the synthesized
# timeline. The walk is sequential in general, but on THIS input its
# outcome has a provable closed form, so the oracle needs windows, not
# a fold (the fold device streaming_twins.py:341+ built for CUSUM
# would also work but is O(n^2) when the accumulator must carry the
# emitted assignments). Proof sketch, verified against create_batches
# on randomized inputs by tests/test_dataflow.py::
# test_closed_form_batching_replay_matches_packer:
#
#  * every file parses to action 'commit' (whitelisted; no
#    hoodie.properties, no rollback/savepoint in the synthesized set),
#    so only the general triple branch of the walk runs, and the
#    CONTINUE recency filter passes everything (all last_modified >
#    EPOCH);
#  * a commit ts owns <= 3 files, and a related triple requires equal
#    ts, so taken triples never overlap; skips advance the walk by
#    exactly 1 — hence the walk lands on the FIRST position of every
#    ts whose 3 files are CONTIGUOUS in the per-table lexicographic
#    order, and takes it ('F'-status completed files `k_k+1.commit`
#    sort after any order whose key has `k` as a string prefix, which
#    is what makes contiguity a real predicate, not a tautology);
#  * every non-taken position p <= n-3 is skipped with candidate
#    str(ts-1), and first_incomplete is the lexicographic STRING min
#    of the candidates (the Java compares strings); positions n-2/n-1
#    hit the stop branch and contribute nothing;
#  * groups are atomic and capacity is 20, so batches hold exactly 6
#    triples: batch_id = tidx // 6 + 1, seq_in_batch = (tidx % 6) * 3
#    + offset, with tidx the per-table take order (= min_pos order).
_BATCH_CTE = f"""
    tf AS ({_TF_SQL}),
    f AS (
      SELECT tf.filename,
             string_split(string_split(tf.filename, '.')[1], '_')[1] AS ts_str
      FROM tf
    ),
    files AS (
      SELECT 'tbl_' || CAST(o.o_custkey % {_N_TABLES} AS VARCHAR) AS table_id,
             f.filename, f.ts_str
      FROM f JOIN orders o ON f.ts_str = CAST(o.o_orderkey AS VARCHAR)
    ),
    ranked AS (
      SELECT table_id, filename, ts_str,
             row_number() OVER (PARTITION BY table_id ORDER BY filename) - 1 AS pos,
             count(*) OVER (PARTITION BY table_id) AS n
      FROM files
    ),
    grp AS (
      SELECT table_id, ts_str, count(*) AS cnt,
             min(pos) AS min_pos, max(pos) AS max_pos
      FROM ranked GROUP BY table_id, ts_str
    ),
    taken AS (
      SELECT table_id, ts_str, min_pos,
             row_number() OVER (PARTITION BY table_id ORDER BY min_pos) - 1 AS tidx
      FROM grp WHERE cnt = 3 AND max_pos - min_pos = 2
    ),
    fi AS (
      SELECT r.table_id,
             min(CAST(CAST(r.ts_str AS BIGINT) - 1 AS VARCHAR)) AS first_incomplete
      FROM ranked r
      LEFT JOIN taken tk ON r.table_id = tk.table_id AND r.ts_str = tk.ts_str
      WHERE tk.ts_str IS NULL AND r.pos <= r.n - 3
      GROUP BY r.table_id
    )
"""


@register(
    "active_batch_packing",
    oracle=f"""
    WITH {_BATCH_CTE}
    SELECT r.table_id,
           CAST(tk.tidx // 6 + 1 AS INT) AS batch_id,
           CAST((tk.tidx % 6) * 3 + (r.pos - tk.min_pos) AS INT) AS seq_in_batch,
           r.filename,
           coalesce(fi.first_incomplete, '') AS first_incomplete
    FROM ranked r
    JOIN taken tk ON r.table_id = tk.table_id AND r.ts_str = tk.ts_str
    LEFT JOIN fi ON r.table_id = fi.table_id
    """,
)
def active_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (active): exact greedy commit-group packing per table via the
    batch engine (applyInPandas). Hash-checked since r8: the walk is
    sequential, but on the synthesized timeline its outcome has a
    closed form (contiguous complete triples in lexicographic position
    order, capacity 20 => 6 triples per batch) — see _BATCH_CTE for
    the proof sketch; the general algorithm stays covered by the
    golden-file + table-driven batcher tests and the randomized
    replay-equivalence property test.

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


@register(
    "checkpoint_lookback",
    oracle=f"""
    WITH {_BATCH_CTE},
    last_t AS (
      SELECT table_id, ts_str, min_pos, tidx,
             row_number() OVER (PARTITION BY table_id ORDER BY tidx DESC) AS rk
      FROM taken
    )
    SELECT lt.table_id,
           CAST(lt.tidx // 6 + 1 AS INT) AS batch_id,
           r.filename AS last_uploaded_file,
           coalesce(fi.first_incomplete, '') AS first_incomplete_commit_file
    FROM last_t lt
    JOIN ranked r ON r.table_id = lt.table_id AND r.pos = lt.min_pos
    LEFT JOIN fi ON fi.table_id = lt.table_id
    WHERE lt.rk = 1
    """,
)
def checkpoint_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-table checkpoint advance after batching — last-uploaded
    file via the savepoint/rollback lookback rules + watermark.

    Hash-checked since r8, riding the _BATCH_CTE closed form: batch_id
    = the max batch id; the last batch ends in a commit-action triple,
    so getLastUploadedFileFromBatch
    (TimelineCommitInstantsUploader.java:982-1026) returns batch[-3] =
    the FIRST file of the last-taken triple (pos == its min_pos);
    first_incomplete is the same string-min the packer recorded."""
    from lakeview_spark.runner import compute_checkpoint_updates
    from lakeview_spark.schemas import CHECKPOINTS_SCHEMA

    files = _synthesized_multi_table_timeline(spark, sf_dir)
    batches = _continue_batches(spark, sf_dir)
    empty_ckpts = spark.createDataFrame([], CHECKPOINTS_SCHEMA)
    return compute_checkpoint_updates(batches, files, empty_ckpts, "active").select(
        "table_id", "batch_id", "last_uploaded_file", "first_incomplete_commit_file"
    )
