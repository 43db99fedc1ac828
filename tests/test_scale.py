"""Scale-utility tests: salting preserves join semantics and spreads hot
keys; bucketed joins eliminate the shuffle (asserted on the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeview_spark.operators.scale import bucketed_join, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # skewed big side: one hot key with 10k rows
    big = spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(1, "hot"), (9500, "cold")], ["k", "name"])

    plain = big.join(small, "k").groupBy("name").count().collect()
    salted = salted_join(big, small, "k").groupBy("name").count().collect()
    assert {(r.name, r["count"]) for r in plain} == {(r.name, r["count"]) for r in salted}


def test_salted_join_left_rows_preserved(spark):
    big = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(7, "x")], ["k", "name"])
    out = salted_join(big, small, "k")
    assert out.count() == 1000
    assert out.select("v").distinct().count() == 1000


@pytest.mark.slow
def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse.dir is a static conf — bucketed tables land in the
    # session default (cwd/spark-warehouse), dropped + cleaned below
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    try:
        write_bucketed(left, "bktl", "k", n_buckets=8, sort_by="k")
        write_bucketed(right, "bktr", "k", n_buckets=8, sort_by="k")

        joined = bucketed_join(spark, "bktl", "bktr", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # matching bucketing on both sides: no shuffle exchange in the join
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bktl")
        spark.sql("DROP TABLE IF EXISTS bktr")


SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_timeline_search_plans_take_ordered_not_global_sort(spark):
    from lakeview_spark.plans import QUERIES

    plan = _plan(QUERIES["timeline_search"](spark, SF_DIR))
    # the page fetch is a per-partition top-50 merge, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_minhash_lsh_pairs_reads_materialized_signatures(spark):
    from lakeview_spark.plans import QUERIES

    plan = _plan(QUERIES["dedup_minhash_lsh_pairs"](spark, SF_DIR))
    # both self-join sides are parquet scans of the persisted signature
    # table — the shingle pipeline (explode + groupBy mins) is absent
    assert plan.count("lakeview_mat_minhash_sig") >= 2
    assert "stack(" not in plan


def test_embedding_cosine_reads_materialized_buckets(spark):
    from lakeview_spark.plans import QUERIES

    plan = _plan(QUERIES["dedup_embedding_cosine"](spark, SF_DIR))
    assert plan.count("lakeview_mat_lsh_bucketed") >= 2


def test_index_self_joins_are_exchange_free_past_broadcast(spark):
    """The 100 TB claim behind the bucketed scratch tables: when the
    signature/index tables outgrow the broadcast threshold (simulated
    by disabling broadcast), their self-joins sort-merge over co-located
    buckets with NO Exchange feeding the join — the only shuffle left
    in the LSH pair query is the final pair-distinct."""
    from lakeview_spark.plans import QUERIES

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = _plan(QUERIES["dedup_minhash_lsh_pairs"](spark, SF_DIR))
        assert pairs.count("SortMergeJoin") == 1
        assert pairs.count("Exchange") == 1  # the distinct only
        cosine = _plan(QUERIES["dedup_embedding_cosine"](spark, SF_DIR))
        assert cosine.count("SortMergeJoin") == 1
        assert cosine.count("Exchange") == 0
        # Jaccard pair join: one SMJ over two co-located bucketed scans
        # of the persisted index; the ONLY shuffle is the pair groupBy
        # (the size joins stay hinted broadcasts)
        jac = _plan(QUERIES["dedup_ngram_jaccard"](spark, SF_DIR))
        assert jac.count("lakeview_mat_jaccard_index") >= 2
        assert jac.count("SortMergeJoin") == 1
        assert jac.count("Exchange hashpartitioning") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# a 1-row (or 4-row centroid/plane) broadcast cross join used to attach
# a query vector / probe bucket to every candidate — constant-size
# build side, not a scale hazard.
_TINY_BROADCAST_OK = {
    "similarity_topk_cosine",
    "similarity_ann_ivf",
    "similarity_ann_multiprobe",
    "similarity_lsh_buckets",
    "dedup_embedding_cosine",
    "embedding_centroid_assign",
    "embedding_centroid_stats",
    "kmeans_train",  # same 4-row centroid broadcast as centroid_assign
    "kmeans_train_quantized",  # same k-row centroid broadcast, integer domain
    "similarity_ann_ivf_pq",  # same k-row coarse-centroid broadcast, integer domain
    "events_quantile_sketch",  # 3-row quantile-grid broadcast onto the bin table

    "forecast_revenue",
    "minhash_similarity_estimate",
    "corpus_distinct_kmv",
    "corpus_distinct_hll",  # same 1-row exact-count broadcast as the KMV twin
    "quality_filter_funnel",
    "table_health_summary",
    "text_tfidf_top_terms",  # 1-row corpus-size broadcast for the idf
    "corpus_vocab_coverage",  # 1-row total-tokens broadcast for the share
    "important_parts",  # 1-row global-revenue-threshold broadcast (Q11)
    "similarity_tfidf_pairs",  # wraps the same 1-row idf broadcast
    "sample_temperature",  # 1-row normalizer broadcast onto the 5-row rate table
    "eval_lsh_precision_recall",  # 1-row scalar-count broadcasts
    "eval_embedding_bucket_health",  # 1-row total-count broadcast
    "eval_simhash_band_quality",  # bounded-sample all-pairs truth + scalar counts
    "eval_ann_recall",  # fixed-size probe sample broadcast for the exact-top-k truth
    "eval_pq_recall",  # same probe-sample broadcast for the ADC-vs-exact truth
    "cold_customers",  # 1-row avg-balance threshold broadcast (Q22 decorrelation)
    "eval_community_modularity",  # 1-row edge-count broadcast attaches m
    "text_paragraph_ppl",  # 1-row tercile-threshold broadcast (r13)
    "text_paragraph_apply",  # same 1-row threshold broadcast
    "eval_paragraph_retention",  # same 1-row threshold broadcast (r14)
    "eval_graph_ann_recall",  # fixed-size probe-sample broadcast for the exact truth
    "eval_graph_ann_recall_clustered",  # same audit recursed onto the derived corpus
    "similarity_ann_graph_upsert",  # k-row base-hub broadcast for the delta up-links
    "eval_graph_upsert_recall",  # fixed-size probe + base-hub broadcasts (the gann shape)
    "events_gapfill_locf",  # 1-row min/max range broadcast builds the dense grid
    "corpus_source_overlap_theta",  # 20-row per-source sketch-stats pair join
    "similarity_ann_sq8",  # 1-row dim-stats + fixed-size probe broadcasts
    "text_surprisal_bits",  # 1-row corpus-total broadcast after the doc agg
    "mix_curriculum_schedule",  # 1-row total/range/threshold broadcasts
    "layout_zorder_stats",  # 1-row min/max range broadcast for normalization
    "sample_dsir_select",  # 1-row model-constants broadcast (N_S, N_T, V)
    "corpus_unigram_prune",  # 1-row char/vocab-total + range/threshold broadcasts
    "corpus_unigram_tokenize",  # same + the 1-row broadcast vocabulary MAP column
    "eval_matryoshka_truncation",  # fixed-size probe broadcast for the exact truth
    "classifier_quality_apply",  # 1-row train-count scalars broadcast
    "eval_classifier_roc",  # 1-row range/total + 1-row AUC-numerator broadcasts
    "text_perplexity_bigram",  # 1-row (N, V) model-constants broadcast
    "eval_rq_recall",  # fixed-size probe broadcast for the exact truth
    "corpus_source_similarity",  # sources^2 pair grid from a k-row totals broadcast
    "corpus_heaps_growth",  # 1-row corpus-size + 8-row grid/bucket broadcasts
    "corpus_snapshot_drift",  # 1-row half-threshold broadcast onto the token stream
    "eval_classifier_calibration",  # 1-row train-count scalars broadcast (shared scorer)
    "sample_kcenter_select",  # <=k-row selected-centers broadcast (the kmeans shape)
    "orders_market_basket",  # 1-row order-count broadcast onto the pair table
    "corpus_collocations_pmi",  # 1-row bigram-total broadcast onto the type table
    "eval_community_conductance",  # 1-row total-volume broadcast (the modularity shape)
    "eval_ivfpq_nprobe_sweep",  # fixed-size probe + k-row centroid broadcasts (the PQ shape)
    "similarity_ann_ivf_pq_refined",  # same k-row centroid broadcast via the shared ADC frame
    "retrieval_mmr_rerank",  # same shared ADC frame (mmr_cands builder)
    "eval_mmr_diversity",  # rides retrieval_mmr_rerank + the same scratch
    "customer_rfm_segments",  # 1-row max-date broadcast onto the customer aggregate
}


@pytest.mark.slow
def test_no_query_plans_a_cartesian_or_unbounded_nested_loop(spark):
    """Scale guard over the whole registry: no registered query may plan
    a CartesianProduct, and BroadcastNestedLoopJoin is allowed only for
    the whitelisted constant-size broadcast patterns."""
    from lakeview_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    offenders = {}
    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _TINY_BROADCAST_OK:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_star_join_scans_push_filters_and_prune_columns(spark):
    """Scan hygiene: the heavy fact scans must push their predicates into
    the parquet reader and read only referenced columns (SCALE.md §6)."""
    from lakeview_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    plan = _plan(QUERIES["forecast_revenue"](spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l and "lineitem" in l)
    # predicate pushdown reached the scan
    assert "l_shipdate" in scan.split("DataFilters")[1][:200]
    # column pruning: the 4 referenced columns only, not the full table
    cols = scan.split("FileScan parquet [")[1].split("]")[0]
    assert set(c.split("#")[0] for c in cols.split(",")) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
    }

    plan = _plan(QUERIES["shipping_priority"](spark, sf_dir))
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    cust = next(l for l in scans if "customer" in l)
    assert "c_mktsegment" in cust.split("DataFilters")[1][:250]


def test_salted_two_phase_topk_is_exact(spark):
    """eval_ann_recall's correctness hinges on the salted two-phase
    row_number top-k being EXACT (any global top-k row is in its salt's
    top-k). Property-check the device on an adversarial frame: many
    ties, values concentrated in few salts, k larger than some salt's
    row count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    k, salt_n = 5, 4
    rows = [(qid, nid, float((nid * 7919) % 13)) for qid in range(3) for nid in range(40)]
    df = spark.createDataFrame(rows, "qid int, nid int, score double")
    direct = (
        df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("score"), "nid")
            ),
        )
        .filter(F.col("rn") <= k)
        .select("qid", "nid")
    )
    salted = df.withColumn("salt", F.pmod(F.xxhash64("nid"), F.lit(salt_n)))
    stage1 = (
        salted.withColumn(
            "rn1",
            F.row_number().over(
                Window.partitionBy("qid", "salt").orderBy(F.desc("score"), "nid")
            ),
        )
        .filter(F.col("rn1") <= k)
    )
    stage2 = (
        stage1.withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("score"), "nid")
            ),
        )
        .filter(F.col("rn2") <= k)
        .select("qid", "nid")
    )
    assert {tuple(r) for r in direct.collect()} == {
        tuple(r) for r in stage2.collect()
    }
