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

# Round-5 window (VERDICT r04 next-1): the 7 queries whose only green
# rows were r02 (measured on the pre-r3-regen testdata) lead so every
# registered query finally holds a current-testdata driver row; then
# the 3 queries NEW this round; then the 3 permanent rows-only
# exemptions (err=no_oracle never turns green, so they can only be
# driver-exercised inside the window); then the 3 queries whose PLANS
# changed this round (tf-idf posting-table materialization, Q5
# predicate pushdown, z-score zero-variance guard) so their rewrites
# are driver-re-proven; the rest are r04-green sentinels kept from the
# previous window re-validating the shared layers (streaming twins,
# packing prefix sum, multimodal codecs, star joins, scratch
# materialization). Rotated OUT (each keeps its r04 green row, layers
# re-proved by in-window kin): events_sessionization, compaction_
# backlog, timeline_trends, events_asof_click_value, events_sliding_
# window_stats, events_user_retention, events_click_attribution,
# manifest_diff, new_table_detection, table_stats_daily.
_DRIVER_WINDOW = [
    # r02-only rows, displaced late-r4 — rotate through per VERDICT r04
    "forecast_revenue",
    "brand_supplier_breadth",
    "customer_order_distribution",
    "brand_revenue_share",
    "priority_by_orderpriority",
    "returned_items",
    "dedup_simhash",
    # new this round (r5): context-window chunking, deterministic
    # train/val/test split, token-diversity telemetry, cross-split
    # near-dup leakage audit, TPC-H Q18 group-having shape
    "docs_chunk_overlap",
    "dataset_split_assign",
    "corpus_token_concentration",
    "eval_split_leakage",
    "large_order_customers",
    "dedup_shared_spans",
    "embedding_quantize_error",
    "eval_ann_recall",
    "pack_length_buckets",
    "docs_cdc_chunks",
    "nation_trade_volume",
    "cold_customers",
    "events_gapfill_locf",
    "events_session_paths",
    "events_hourly_ohlc",
    # new late-r5: label-aware embedding eval + banded range join
    # (swapped in for the r04-green sentinels multimodal_decode_wav,
    # multimodal_resize_bmp, region_segment_profile,
    # events_rollup_cascade — each keeps its r04 row and a same-layer
    # kin stays in-window: patch_stats/audio_energy for the codecs,
    # shipping_priority/top_revenue_supplier for the star joins,
    # funnel_conversion for the events cascade)
    "embedding_label_purity",
    "embedding_knn_label_accuracy",
    "contrastive_pair_sample",
    "events_error_proximity",
    # quality-aware keep policy over the cluster table (displaced the
    # r04-green sample_temperature; sampling layer still covered
    # in-window by dataset_split_assign)
    "dedup_apply_quality",
    # retrieval composition (displaced the r04-green dedup_semdedup;
    # its cluster-restriction layer is re-proved in-window by
    # embedding_label_purity riding the same centroid assignment)
    "retrieval_semantic_docs",
    # the banded range join under Structured Streaming (displaced the
    # r04-green stream_quality_filter; its stateless-predicate layer
    # stays covered in-window by text_boilerplate_lines and the other
    # four stream twins)
    "stream_error_proximity",
    # perceptual image dedup (displaced the r04-green
    # multimodal_patch_stats; the image mapInPandas codec chain is
    # re-proved by this very op, audio by multimodal_audio_energy)
    "multimodal_phash_twins",
    # vocab coverage curve (displaced the r04-green top_revenue_supplier;
    # the star-join layer keeps shipping_priority in-window)
    "corpus_vocab_coverage",
    # count-min heavy-hitter audit + pivot reshape (displaced the
    # r04-green stream_doc_dedup and pack_sequence_stats; streaming
    # keeps 4 twins in-window, packing keeps pack_training_sequences)
    "corpus_heavy_hitters_cms",
    "events_type_hour_pivot",
    # TPC-H plan-shape breadth: Q17 decorrelation, Q19 disjunctive
    # pushdown, Q21 semi/anti chain, Q11 scalar threshold (displaced
    # the r04-green top_partitions, events_funnel_conversion,
    # stream_embedding_neardup — its stream-static join layer is
    # re-proved in-window by stream_error_proximity — and
    # pack_training_sequences)
    "small_quantity_revenue",
    "promo_disjunctive_revenue",
    "flagged_suppliers",
    "important_parts",
    # kNN-graph triangle counts, plus similarity_knn_graph itself whose
    # plan changed (now a materialized scratch feeding the triangles) —
    # displaced the r04-green partition_size_distribution and
    # timeline_completeness (their layers hold 3 and 5 other green r03/
    # r04 rows respectively)
    "graph_triangle_counts",
    "similarity_knn_graph",
    # mutual-kNN reciprocity (displaced the r04-green
    # stream_token_stats; streaming keeps stream_event_sessions and
    # stream_error_proximity in-window)
    "graph_mutual_edges",
    # permanent rows-only exemptions (documented; never turn green)
    "active_batch_packing",
    "checkpoint_lookback",
    "kmeans_train",
    # plans changed this round — re-prove under the driver
    "similarity_tfidf_pairs",
    "local_supplier_volume",
    "events_anomaly_zscore",
    # r04-green sentinels kept in-window (shared-layer re-validation)
    "shipping_priority",
    "multimodal_audio_energy",
    "stream_event_sessions",
    "text_boilerplate_lines",
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
