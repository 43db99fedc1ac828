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

# Round-12 window (COVERAGE.md "Round-12 plan", written at r11 close,
# executed + amended in-round): the r11 window rotates out (49 + the
# exemption earned r11 rows). The 50 slots: `kmeans_train` (the
# permanent rows-only exemption), the queries CHANGED or NEW in r12
# (the scale-adaptive-nprobe IVF-PQ family + its new exact-rerank
# refinement, the df-capped bigram perplexity, the Apriori-pruned
# market basket, the materialized-RQ recall audit), then the FULL
# 19-query r07-stale cohort (every query whose newest green driver row
# is CORRECTNESS_r07 — the stalest rows in the registry, the nine
# r11-displaced sentinels among them; CORRECTNESS_r07 order), then
# top-ups from the oldest r08-green queries in CORRECTNESS_r08 order.
# r12 additions displace the deepest r08 top-ups first (each displaced
# query keeps its r08 green row and the every-round sweep — the r7
# displacement device).
_DRIVER_WINDOW = [
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # CHANGED in r12 (VERDICT r11 next-3): scale-adaptive nprobe =
    # max(3, ceil(k/4)) in the shared pclusters CTE — all three riders
    # must re-earn driver rows
    "similarity_ann_ivf_pq",
    "eval_pq_recall",
    "eval_ivfpq_nprobe_sweep",
    # NEW in r12: exact-rerank refinement of the composed search (the
    # sf1 ADC ceiling is 0.60; refinement holds recall@10 >= 0.6 at
    # sf1 — SCALE.md §8a3b)
    "similarity_ann_ivf_pq_refined",
    # CHANGED in r12 (VERDICT r11 next-4): df-capped bigram vocabulary
    "text_perplexity_bigram",
    # CHANGED in r12 (VERDICT r11 next-5): Apriori item-prune
    "orders_market_basket",
    # CHANGED in r12 (VERDICT r11 next-8): materialized rq_codes
    "eval_rq_recall",
    # NEW in r12 (VERDICT r11 next-9): per-source document caps
    "mix_source_caps",
    # NEW in r12 (J7 breadth): the Q2 argmin-lookup and Q20
    # threshold-semi-join shapes — displace the two deepest r08
    # top-ups (`text_quality_score`, `text_repetition_score`; both
    # keep r08 green rows + the every-round sweep, text kins
    # `text_language_id` in-window)
    "cheapest_supplier_q2",
    "promo_stock_suppliers_q20",
    # NEW in r12: Markov removal-effect attribution (displaces
    # `text_language_id`, the deepest remaining r08 top-up; r08 green
    # row + every-round sweep; events kins `events_sessionization`
    # in-window)
    "events_attribution_markov",
    # NEW in r12: MMR diversified rerank (displaces
    # `union_dedup_discovery`, the deepest remaining r08 top-up; r08
    # green row + every-round sweep; retrieval kins
    # `similarity_ann_ivf_pq`/`similarity_ann_ivf_pq_refined` in-window)
    "retrieval_mmr_rerank",
    # NEW in r12: the MMR stage's relevance-vs-diversity audit
    # (displaces `top_partitions`, the deepest remaining r08 top-up;
    # r08 green row + every-round sweep; partition kins hold r10 rows)
    "eval_mmr_diversity",
    # NEW in r12: live per-source admission caps (displaces
    # `timeline_trends`, the deepest remaining r08 top-up; r08 green
    # row + every-round sweep; timeline kins `timeline_completeness`
    # in-window)
    "stream_source_caps",
    # the r07-stale cohort — every query whose newest green row is
    # CORRECTNESS_r07, in CORRECTNESS_r07 order
    "contamination_ngram_overlap",
    "corpus_cube_stats",
    "corpus_distinct_kmv",
    "corpus_top_tokens",
    "dedup_apply",
    "dedup_cluster_stats",
    "dedup_incremental_lsh",
    "dedup_minhash_signatures",
    "dedup_simhash_hamming_pairs",
    "embedding_centroid_stats",
    "eval_dedup_reduction",
    "eval_language_id_confusion",
    "eval_lsh_bucket_health",
    "minhash_similarity_estimate",
    "partition_skew",
    "sample_stratified",
    "similarity_ann_multiprobe",
    "similarity_topk_cosine",
    "timeline_search",
    # r08-cohort top-ups, CORRECTNESS_r08 order (19 of the 45 stale
    # r08 rows fit; the 26 remaining lead the r13 rotation)
    "events_sessionization",
    "events_user_value_quartiles",
    "exactly_one_guard",
    "first_incomplete_commit",
    "instant_sort_order",
    "manifest_diff",
    "multimodal_decode_wav",
    "multimodal_patch_stats",
    "new_table_detection",
    "pack_sequence_stats",
    "pack_training_sequences",
    "recent_commit_groups",
    "region_segment_profile",
    "stream_quality_filter",
    "table_counts_rollup",
    "timeline_completeness",
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
