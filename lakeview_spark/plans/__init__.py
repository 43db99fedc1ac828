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

# Round-14 window (COVERAGE.md "Round-14 plan", written at r13 close,
# executed + amended in-round): the r13 window rotates out (49 green
# rows + the exemption earned). The 50 slots: `kmeans_train` (the
# permanent rows-only exemption), the queries NEW or whose OUTPUT
# changed in r14 (the graph-ANN rerank pair; the NEW clustered-corpus
# recall gate, CCNet retention ablation, and upsert pair), then EVERY
# remaining r09-stale row — all 43 of them fit once the two
# hash-identical r14 lineage changes (dedup_ngram_jaccard,
# corpus_source_similarity) and the two planned-but-r13-green top-ups
# (eval_lsh_precision_recall, contamination_apply) yield their slots —
# clearing VERDICT r13 next-4's "no row older than r10" bar exactly.
_DRIVER_WINDOW = [
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # CHANGED in r14 (VERDICT r13 next-1): cluster-local exact rerank
    # (kept-beam cluster sources) + the r13-advice reversed-long-link
    # cap — recall@10 0.50 -> 1.00 at sf1, 0.46 -> 0.99 clustered
    "similarity_ann_graph",
    "eval_graph_ann_recall",
    # NEW in r14 (VERDICT r13 next-3): the clustered-corpus recall
    # audit as a permanent driver-checked gate (derived corpus, full
    # index replay in both engines)
    "eval_graph_ann_recall_clustered",
    # (dedup_ngram_jaccard and corpus_source_similarity also changed in
    # r14 — ADVICE df-cap prefilter / the one-pass basket rewrite — but
    # both are output-HASH-IDENTICAL with r13-green rows and the
    # every-round sf0.01 sweep re-verifies them, so their slots yield
    # to the last four r09-stale rows, clearing the "no row older than
    # r10" bar exactly: the pipeline_train_set displacement precedent)
    # NEW in r14 (VERDICT r13 next-5): per-(lang, bucket) CCNet
    # retention ablation completing the paragraph family
    "eval_paragraph_retention",
    # NEW in r14 (VERDICT r13 next-9 stretch): O(delta) incremental
    # graph-index maintenance — the attach edge set and the
    # upserted-graph recall audit
    "similarity_ann_graph_upsert",
    "eval_graph_upsert_recall",
    # the r09-green top-up, in CORRECTNESS_r09 order (COVERAGE.md
    # "Round-14 plan" list)
    "events_sliding_window_stats",
    "events_user_retention",
    "events_rollup_cascade",
    "stream_token_stats",
    "multimodal_resize_bmp",
    "events_props_json_stats",
    "events_click_attribution",
    "partition_histogram",
    "stream_embedding_neardup",
    "sample_temperature",
    "duplicate_wins_join",
    "dedup_semdedup",
    "events_funnel_conversion",
    "compaction_backlog",
    "events_asof_click_value",
    "file_size_percentiles",
    "partition_size_distribution",
    "top_revenue_supplier",
    "table_stats_daily",
    "corpus_distinct_hll",
    "eval_simhash_band_quality",
    "pricing_summary",
    "forecast_revenue",
    "brand_revenue_share",
    "local_supplier_volume",
    "nation_trade_volume",
    "promo_disjunctive_revenue",
    "important_parts",
    "stream_event_sessions",
    "embedding_pq_codebook_stats",
    "stream_bloom_prune",
    "corpus_bpe_train",
    "corpus_bpe_apply",
    "corpus_source_overlap_theta",
    "stream_interval_join",
    "similarity_ann_sq8",
    "text_surprisal_bits",
    "layout_zorder_stats",
    "stream_interval_join_outer",
    # the final four r09-stale rows (eval_lsh_precision_recall and
    # contamination_apply yielded their planned slots — both r13-green)
    "graph_kcore",
    "multimodal_frame_sample",
    "sample_dsir_select",
    "stream_session_daily_rollup",
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
