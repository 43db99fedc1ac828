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

# Round-10 window (VERDICT r09 next-1 — the rotation COVERAGE.md wrote
# down at r9 close, executed): the fifteen r9-new queries earned r09
# rows and rotate out. The window is the full 38-query r06 cohort
# (every query whose newest green driver row is CORRECTNESS_r06 —
# each also sweep-green at sf0.01 every round since, so this is
# freshness hygiene, not repair; the fifteen the r9 additions
# displaced lead, in the displacement order the r9 verdict recorded,
# then the rest in CORRECTNESS_r06 order), then the fixed slots:
# `kmeans_train` (the permanent rows-only exemption) and the queries
# whose code changes in r10 (`mix_curriculum_schedule` — the
# dense-rank source-id fix changes position_key; the PQ pair
# `similarity_ann_ivf_pq`/`eval_pq_recall` — multiprobe composed
# search changes their outputs) plus every query NEW in r10. The
# remaining slots top up with the oldest r07-green queries in
# CORRECTNESS_r07 order; r10 additions displace the deepest top-ups
# first (each keeps its r07 green row, the every-round sweep, and
# same-layer kins in-window — the r7 displacement device).
_DRIVER_WINDOW = [
    # the fifteen r06-green queries the r9 additions displaced
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
    "shipping_priority",
    # the remaining 23 of the r06 cohort, CORRECTNESS_r06 order
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
    "dedup_apply_quality",
    "retrieval_semantic_docs",
    "stream_error_proximity",
    "multimodal_phash_twins",
    "corpus_vocab_coverage",
    "corpus_heavy_hitters_cms",
    "graph_triangle_counts",
    "graph_mutual_edges",
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # r10 code changes whose outputs differ from their newest rows:
    # dense-rank source ids (r9 ADVICE medium)
    "mix_curriculum_schedule",
    # multiprobe composed search (VERDICT r09 next-4)
    "similarity_ann_ivf_pq",
    "eval_pq_recall",
    # NEW in r10: the end-to-end training-set funnel (VERDICT r09
    # next-5) — displaces `dedup_exact`, the deepest r07 top-up
    # (r07 green row, every-round sweep, the whole dedup layer's
    # standalone stages compose INTO this query, so the machinery is
    # driver-exercised through it)
    "pipeline_train_set",
    # NEW in r10: unigram-LM vocabulary prune round in bit-length space
    # (VERDICT r09 next-9 stretch) — displaces `table_health_summary`
    # (r07 green row, every-round sweep, table-stats kins in the r06
    # cohort above)
    "corpus_unigram_prune",
    # NEW in r10: hard-negative mining over the bucketed LSH index —
    # displaces `timeline_search` (r07 green row, every-round sweep,
    # timeline kins `timeline_parse`/`checkpoint_filter` in-window)
    "contrastive_hard_negatives",
    # NEW in r10: deterministic FIM span corruption — displaces
    # `partition_skew` (r07 green row, every-round sweep, the
    # partition-stats layer keeps its r09-green kins)
    "pack_fim_spans",
    # NEW in r10: the Viterbi tokenizer (apply half of the unigram
    # prune) — displaces `uuid3_table_ids` (r07 green row, every-round
    # sweep, id-layer kin timeline_parse in-window)
    "corpus_unigram_tokenize",
    # r10 change: the AvailableNow runner pins stream-state partitions
    # (outputs bit-identical, all 12 twins re-verified hash-exact at
    # sf0.01) — one twin re-proves the shared runner path under the
    # driver, the r8 "shared source path" precedent; displaces
    # `archived_batching` (r07 green row, every-round sweep)
    "stream_doc_dedup",
    # NEW in r10: the live curation funnel (quality -> static
    # decontamination verdict -> dedup-within-watermark) — displaces
    # `checkpoint_filter` (r07 green row, every-round sweep, timeline
    # kin timeline_parse in-window)
    "stream_curation_funnel",
    # NEW in r10: the Matryoshka truncation audit — displaces
    # `timeline_parse`, the last r07 top-up (r07 green row,
    # every-round sweep; the timeline layer keeps driver-fresh rows
    # via the r08/r09 cohorts)
    "eval_matryoshka_truncation",
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
