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

# Round-15 window (COVERAGE.md "Round-15 plan", written at r14 close,
# amended in-round per VERDICT r14 next-9): the r14 window rotates out
# (49 hash rows + the exemption earned). The 50 slots: `kmeans_train`
# (the permanent rows-only exemption); the 5 r14-implemented ops
# registering this round (pipeline/repetition.py — the pending-module
# device flips to @register now that slots freed up); every query whose
# LINEAGE changed in the r15 optimization round (all output-hash-
# identical, oracle-checked at both SFs in-round — fresh driver rows
# earn the independent gate); the six r14-optimizer-touched queries
# VERDICT r14 next-9 ordered into the window; topped up with the oldest
# r10-green rows in CORRECTNESS_r10 order (the remainder of that list
# leads the r16 rotation).
_DRIVER_WINDOW = [
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # NEW in r15 (registered at this rotation; implemented + oracle-
    # verified in r14's pending module)
    "text_repetition_gopher",
    "eval_repetition_retention",
    "eval_repetition_threshold_sweep",
    "eval_bpe_fertility",
    "stream_repetition_gate",
    # lineage CHANGED in r15 (optimization round 2: checkpoint
    # summarizer rewrite; classifier weights scratch + spread; semdedup
    # assigned-vector scratch; shared LSH truth pairs; market-basket
    # item/support scratches; per-source histogram scratch)
    "checkpoint_lookback",
    "eval_classifier_calibration",
    "eval_classifier_roc",
    "classifier_quality_apply",
    "dedup_semdedup",
    "eval_lsh_precision_recall",
    "eval_lsh_scurve",
    "orders_market_basket",
    "corpus_source_similarity",
    # r14-optimizer-touched (VERDICT r14 next-9): lineage changed last
    # round, covered only by in-round sweeps until now
    "dedup_simhash",
    "eval_pq_recall",
    "shipping_priority",
    "timeline_completeness",
    "similarity_ann_ivf_pq",
    "sample_kcenter_select",
    # oldest r10-green top-up, in CORRECTNESS_r10 order (COVERAGE.md
    # "Round-15 plan" list; shipping_priority already has a slot above)
    "flagged_suppliers",
    "small_quantity_revenue",
    "cold_customers",
    "events_type_hour_pivot",
    "events_hourly_ohlc",
    "events_session_paths",
    "events_error_proximity",
    "events_gapfill_locf",
    "large_order_customers",
    "events_anomaly_zscore",
    "brand_supplier_breadth",
    "customer_order_distribution",
    "priority_by_orderpriority",
    "returned_items",
    "similarity_knn_graph",
    "multimodal_audio_energy",
    "similarity_tfidf_pairs",
    "text_boilerplate_lines",
    "docs_chunk_overlap",
    "dataset_split_assign",
    "corpus_token_concentration",
    "eval_split_leakage",
    "dedup_shared_spans",
    "embedding_quantize_error",
    "pack_length_buckets",
    "docs_cdc_chunks",
    "embedding_label_purity",
    "embedding_knn_label_accuracy",
    "contrastive_pair_sample",
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
