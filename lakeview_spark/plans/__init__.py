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

# Round-9 window (VERDICT r08 next-4 — the rotation COVERAGE.md wrote
# down at r8 close, executed): the twenty r04-cohort queries the
# late-r8 additions displaced (each r04-green AND sweep-green every
# round since — freshness hygiene, not repair), then the fixed slots:
# `corpus_distinct_hll` (half-landed in r8, no green row — the hygiene
# rule forces it in-window), `kmeans_train` (the permanent rows-only
# exemption), `eval_simhash_band_quality` (its sample mod became
# corpus-derived in r8, output differs from its r07 row),
# the seven 2^53-rule money queries whose sums now ROUND to scale 2
# before the double edge cast (r8-sweep-green but pre-rule driver
# rows), `eval_lsh_precision_recall` (r8 plan slim, re-prove under the
# driver), `stream_event_sessions` (the streaming twins' file source
# gained the layout dispatch in r8), and the three PQ surfaces whose
# codebooks train this round (r9) so their outputs change and must
# re-earn rows. The remaining slots top up with the oldest-green-row
# cohort (r06) in COVERAGE.md order.
_DRIVER_WINDOW = [
    # the twenty r04-cohort queries displaced by the late-r8 additions
    "multimodal_frame_sample",
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
    # half-landed in r8 (judge-verified hash-match, no driver row yet):
    # the HLL distinct sketch — landed properly this round (COVERAGE
    # row, BNLJ allowlist, estimate-quality pytest)
    "corpus_distinct_hll",
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # r8 code changes whose outputs differ from their newest rows
    "eval_simhash_band_quality",
    # the seven 2^53-rule money queries (sums ROUND to scale 2 before
    # the double edge cast since r8; driver rows predate the rule)
    "pricing_summary",
    "forecast_revenue",
    "brand_revenue_share",
    "local_supplier_volume",
    "nation_trade_volume",
    "promo_disjunctive_revenue",
    "important_parts",
    # r8 plan slim — output identical, re-prove under the driver
    "eval_lsh_precision_recall",
    # streaming file source gained the layout dispatch in r8 — one twin
    # re-proves the shared source path
    "stream_event_sessions",
    # r9: PQ codebooks train this round (VERDICT r08 next-7), so all
    # three PQ surfaces' outputs change and must re-earn rows
    "eval_pq_recall",
    "embedding_pq_codebook_stats",
    "similarity_ann_ivf_pq",
    # NEW in r9: the decontamination APPLY half — displaces
    # `shipping_priority`, the last r06 top-up (r06 green row,
    # every-round sweep, the seven money-layer star queries in-window)
    "contamination_apply",
    # NEW in r9 (no green rows, hygiene rule forces them in-window):
    # the mergeable-sketch stream-static composition and the full BPE
    # trainer + its tokenize-apply — they displace `flagged_suppliers`,
    # `small_quantity_revenue`, and `cold_customers`, each of which
    # keeps its r06 green row, the every-round sweep, and 4+ star-join
    # kins in-window (the r7 displacement device)
    "stream_bloom_prune",
    "corpus_bpe_train",
    "corpus_bpe_apply",
    # NEW in r9: theta-sketch set algebra (cross-source overlap) — it
    # displaces `events_type_hour_pivot`, which keeps its r06 green
    # row, the every-round sweep, and 10+ events-layer kins in-window
    "corpus_source_overlap_theta",
    # NEW in r9: the stream-STREAM interval join (view->click
    # attribution with join state on both sides) — displaces
    # `events_hourly_ohlc` under the same device (r06 green row,
    # every-round sweep, 9+ events-layer kins in-window)
    "stream_interval_join",
    # NEW in r9: SQ8 scalar-quantized ANN with recall@1 audit —
    # displaces `events_session_paths` (r06 green row, every-round
    # sweep, 8+ events-layer kins in-window)
    "similarity_ann_sq8",
    # NEW in r9: integer bit-length surprisal scoring — displaces
    # `events_error_proximity` (r06 green row, every-round sweep, 7+
    # events-layer kins in-window)
    "text_surprisal_bits",
    # NEW in r9: curriculum training order (histogram-quartile stages,
    # source round-robin, closed-form position key) — displaces
    # `events_gapfill_locf` (r06 green row, every-round sweep, 6+
    # events-layer kins in-window)
    "mix_curriculum_schedule",
    # NEW in r9: z-order layout telemetry (the registered twin of the
    # fs-based zorder_write/file_pruning_stats pair) — displaces
    # `large_order_customers` (r06 green row, every-round sweep, 5+
    # star-join kins in-window)
    "layout_zorder_stats",
    # NEW in r9: LEFT OUTER stream-stream interval join (watermark-timed
    # NULL emission, the tie rule pinned empirically) — displaces
    # `events_anomaly_zscore` (r06 green row, every-round sweep, 6+
    # events-layer kins in-window)
    "stream_interval_join_outer",
    # NEW in r9: DSIR importance selection (bigram bit-length LLR) —
    # displaces `brand_supplier_breadth` (r06 green row, every-round
    # sweep, 4+ star-join kins in-window)
    "sample_dsir_select",
    # NEW in r9: chained stateful streaming (session_window -> daily
    # window in one query) — displaces `customer_order_distribution`
    # (r06 green row, every-round sweep, 3+ star-join kins in-window)
    "stream_session_daily_rollup",
    # NEW in r9: leave-one-out bigram novelty — displaces
    # `priority_by_orderpriority` (r06 green row, every-round sweep,
    # 2+ star-join kins in-window plus the seven money queries)
    "text_ngram_novelty",
    # NEW in r9: k-core onion peeling over the kNN graph — displaces
    # `returned_items` (r06 green row, every-round sweep, star-join
    # kins incl. shipping_priority + the seven money queries in-window)
    "graph_kcore",
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
