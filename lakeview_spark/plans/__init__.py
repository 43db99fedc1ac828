"""Plan registry assembly + driver-window ordering.

The round driver snapshots correctness for the FIRST 50 registered
queries only (registration order). Import order alone let 33 queries go
driver-unverified through round 2 (VERDICT r02 §missing-1), so the order
is now explicit: _DRIVER_WINDOW lists the 50 queries the next
CORRECTNESS run must cover — a small sentinel set that stays green
across rounds for continuity, then every query that does not yet have a
green driver row (never checked, stale since its last green row, or new
this round). Queries outside the window keep their green rows from
earlier rounds; COVERAGE.md maps each query to the round that verified
it. Rotate the window as rows turn green.
"""

from lakeview_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401
from lakeview_spark.plans import analytics, coverage, tpch_extra, product  # noqa: F401  (registers on import)
from lakeview_spark import pipeline  # noqa: F401  (registers dedup/similarity/text/multimodal)
from lakeview_spark.plans import streaming_twins  # noqa: F401  (after pipeline: reuses similarity oracle SQL)

# Round-11 window (COVERAGE.md "Round-11 plan", written at r10 close,
# executed): the r10 window rotates out (all 49 + the exemption earned
# r10 rows). The 50 slots: the full 42-query r07 cohort (every query
# whose newest green driver row is CORRECTNESS_r07 — each also
# sweep-green at sf0.01 every round since, so freshness hygiene, not
# repair; CORRECTNESS_r07 order), then `kmeans_train` (the permanent
# rows-only exemption), the queries NEW in r11, and top-ups from the
# oldest r08-green queries in CORRECTNESS_r08 order. r11 additions
# displace the deepest top-ups first (each displaced query keeps its
# r08 green row, the every-round sweep, and same-layer kins in-window
# — the r7 displacement device).
_DRIVER_WINDOW = [
    # the r07 cohort, CORRECTNESS_r07 order
    "archived_batching",
    "checkpoint_filter",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "embedding_centroid_assign",
    "eval_embedding_bucket_health",
    "multimodal_metadata",
    "quality_filter_apply",
    "quality_filter_funnel",
    "similarity_ann_ivf",
    "similarity_lsh_buckets",
    "table_health_summary",
    "text_fingerprint",
    "text_token_count",
    "timeline_parse",
    "uuid3_table_ids",
    "dedup_simhash",
    "eval_ann_recall",
    "stream_value_cusum",
    "text_pii_scrub",
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # NEW in r11: the trained-weights quality classifier + its held-out
    # ROC/AUC audit (VERDICT r10 next-2)
    "classifier_quality_apply",
    "eval_classifier_roc",
    # NEW in r11: the order-2 interpolated bigram perplexity gate
    # (VERDICT r10 next-3) — displaces `instant_sort_order`, the
    # deepest r08 top-up (r08 green row, every-round sweep, sort-layer
    # kin `archived_batching` in-window)
    "text_perplexity_bigram",
    # NEW in r11: NDCG@10 ranking-quality audit for the retrieval path
    # (VERDICT r10 next-7) — displaces `first_incomplete_commit` (r08
    # green row, every-round sweep, timeline kins `checkpoint_filter`/
    # `timeline_parse` in-window)
    "eval_retrieval_ndcg",
    # NEW in r11: the streaming sequence packer twin (VERDICT r10
    # next-4) — displaces `exactly_one_guard` (r08 green row,
    # every-round sweep, guard-layer kin `quality_filter_funnel`
    # in-window)
    "stream_sequence_pack",
    # NEW in r11: the residual-quantization refinement audit (VERDICT
    # r10 next-8 stretch) — displaces `events_user_value_quartiles`
    # (r08 green row, every-round sweep, events kins in the r08 cohort)
    "eval_rq_recall",
    # NEW in r11: live model-based quality gating (the batch-trained
    # classifier's weights applied at ingestion) — displaces
    # `events_sessionization`, the last r08 top-up (r08 green row,
    # every-round sweep; the events layer's freshest rows are the r10
    # cohort, all refreshed last round)
    "stream_classifier_gate",
    # NEW in r11: the Q8 national-market-share star join (J7 breadth:
    # the dual-role nation join) — displaces `similarity_ann_multiprobe`
    # from the r07 cohort (r07 green row, every-round sweep, ANN kins
    # `similarity_ann_ivf`/`eval_ann_recall` in-window); displaced r07
    # members lead the r12 rotation
    "market_share_q8",
    # NEW in r11: pairwise source-distribution histogram intersection
    # (the frequency-weighted complement of the theta set-overlap op)
    # — displaces `eval_lsh_bucket_health` from the r07 cohort (r07
    # green row, every-round sweep, bucket-health kin
    # `eval_embedding_bucket_health` in-window)
    "corpus_source_similarity",
    # NEW late-r11 (this session): the corpus-law telemetry trio, the
    # classifier reliability diagram, and the Q9 star join — each
    # displaces an r07-cohort sentinel (r07 green row, every-round
    # sweep, kins in-window):
    # corpus_zipf_fit displaces `corpus_cube_stats` (corpus kins
    # `corpus_top_tokens`/`corpus_distinct_kmv` in-window)
    "corpus_zipf_fit",
    # corpus_heaps_growth displaces `dedup_cluster_stats` (cluster kin
    # `dedup_clusters` in-window)
    "corpus_heaps_growth",
    # corpus_snapshot_drift displaces `dedup_minhash_signatures`
    # (signature kin `dedup_minhash_lsh_pairs` in-window)
    "corpus_snapshot_drift",
    # eval_classifier_calibration displaces `similarity_topk_cosine`
    # (ANN kins `similarity_ann_ivf`/`eval_ann_recall` in-window)
    "eval_classifier_calibration",
    # supplier_profit_q9 displaces `timeline_search` (timeline kins
    # `timeline_parse`/`checkpoint_filter` in-window)
    "supplier_profit_q9",
    # promo_type_share_q14 displaces `dedup_simhash_hamming_pairs`
    # (simhash kin `dedup_simhash` in-window)
    "promo_type_share_q14",
    # sample_kcenter_select displaces `embedding_centroid_stats`
    # (centroid kin `embedding_centroid_assign` in-window)
    "sample_kcenter_select",
    # stream_drift_monitor displaces `eval_language_id_confusion`
    # (eval kins `eval_dedup_reduction`/`eval_embedding_bucket_health`
    # in-window; stream kin `stream_value_cusum` in-window)
    "stream_drift_monitor",
    # dedup_symspell_pairs displaces `contamination_ngram_overlap`
    # (curation kins `quality_filter_apply`/`quality_filter_funnel`
    # in-window)
    "dedup_symspell_pairs",
    # orders_market_basket displaces `dedup_incremental_lsh` (dedup
    # kins `dedup_exact`/`dedup_minhash_lsh_pairs` in-window)
    "orders_market_basket",
    # mix_budget_plan displaces `minhash_similarity_estimate` (minhash
    # kin `dedup_minhash_lsh_pairs` in-window)
    "mix_budget_plan",
    # corpus_collocations_pmi displaces `partition_skew` (lakehouse
    # kins `table_health_summary`/`archived_batching` in-window; the
    # partition family's freshest rows are the r10 cohort)
    "corpus_collocations_pmi",
    # eval_community_conductance displaces `eval_dedup_reduction` (eval
    # kins `eval_embedding_bucket_health`/`eval_ann_recall` in-window)
    "eval_community_conductance",
    # eval_lsh_scurve displaces `sample_stratified` (sampling kins
    # `sample_kcenter_select`/`mix_budget_plan` in-window)
    "eval_lsh_scurve",
    # eval_ivfpq_nprobe_sweep displaces `dedup_apply` (cluster kin
    # `dedup_clusters` in-window; ANN kins `similarity_ann_ivf`/
    # `eval_ann_recall`/`eval_rq_recall` in-window)
    "eval_ivfpq_nprobe_sweep",
    # customer_rfm_segments displaces `corpus_distinct_kmv` (corpus kin
    # `corpus_zipf_fit` in-window; the KMV sketch's HLL twin holds an
    # r09 green row)
    "customer_rfm_segments",
    # events_markov_transitions displaces `corpus_top_tokens` (corpus
    # kins `corpus_zipf_fit`/`corpus_collocations_pmi` in-window;
    # events kins `stream_value_cusum` in-window, the events layer's
    # freshest rows are the r10 cohort)
    "events_markov_transitions",
]


def ensure_driver_order() -> None:
    """Reorder QUERIES/ORACLES in place so _DRIVER_WINDOW is the
    registration prefix. Idempotent, and a no-op while registration is
    still incomplete: entering the library through a pipeline submodule
    (e.g. ``import lakeview_spark.pipeline.export``) runs this package
    __init__ mid-cycle before the pipeline queries register, so the
    driver contract (``__spark_entry__``) and the hygiene tests call
    this again once imports have settled. Both dicts are mutated in
    place, so every existing reference sees the final order."""
    if not all(name in QUERIES for name in _DRIVER_WINDOW):
        return
    ordered = {name: QUERIES[name] for name in _DRIVER_WINDOW}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    aligned = {name: ORACLES[name] for name in ordered if name in ORACLES}
    ORACLES.clear()
    ORACLES.update(aligned)


ensure_driver_order()
