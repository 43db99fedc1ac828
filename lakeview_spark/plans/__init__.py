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

# Round-8 window (VERDICT r07 next-1 — the rotation COVERAGE.md wrote
# down at r7 close, executed verbatim): the full 40-query r04 cohort
# (every query whose newest green driver row is CORRECTNESS_r04 —
# current-testdata sweep-green each round since, freshness hygiene not
# repair), the 7 r03-cohort queries deferred from the r7 window
# (pure-columnar text layer, token-pair corpus layer, mapInPandas codec
# chain — each had a same-layer kin in-window at r7), and the batching
# pair `active_batch_packing` / `checkpoint_lookback` — graduated THIS
# round from rows-only to hash-checked via the ordered-struct-fold
# oracle device r7 built for CUSUM (VERDICT r07 next-2), so their rows
# can turn green for the first time — plus `kmeans_train`, the single
# remaining rows-only exemption (iterative float-mean; err=no_oracle
# never turns green, in-window is the only driver exercise it gets).
# 40 + 7 + 3 = exactly 50 slots — amended late-r8: the two NEW queries
# (`dedup_containment`, `dedup_span_apply`) have no green row anywhere,
# so the hygiene rule forces them in-window; they displace
# `multimodal_frame_sample` (the codec chain keeps FOUR in-window kins:
# decode_bmp/decode_wav/resize_bmp/patch_stats) and
# `events_sliding_window_stats` (the events layer keeps EIGHT in-window
# kins) — both displaced queries keep their r04 green rows and the
# every-round sf0.01 sweep, the same device the r7 window used.
_DRIVER_WINDOW = [
    # r04 cohort (34 of 40; frame_sample + sliding_window_stats
    # displaced by the containment/span-apply pair, and
    # compaction_backlog + events_asof_click_value +
    # file_size_percentiles + partition_size_distribution displaced by
    # the four late-r8 additions at the tail — all six keep their r04
    # green rows and the every-round sf0.01 sweep)
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
    "stream_doc_dedup",
    "stream_quality_filter",
    "table_counts_rollup",
    "timeline_completeness",
    "timeline_trends",
    "top_partitions",
    "union_dedup_discovery",
    # r03 cohort, deferred from the r7 window (7 queries)
    "text_language_id",
    "text_quality_score",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "corpus_bigram_counts",
    "corpus_bigram_cohesion",
    "multimodal_decode_bmp",
    # NEW in r8: asymmetric containment dedup (Broder's containment
    # coefficient — the truncation/excerpt pairs symmetric Jaccard
    # misses) and the span-level dedup APPLY (Lee-et-al exact-substring
    # removal output, the missing half of dedup_shared_spans)
    "dedup_containment",
    "dedup_span_apply",
    # graduated from rows-only to hash-checked this round (r8) via the
    # closed-form windowed replay oracle (see plans/coverage.py)
    "active_batch_packing",
    "checkpoint_lookback",
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # NEW in late r8: the hash-checked integer-domain twin of the float
    # trainer — the full 3-iteration Lloyd's loop replayed bit-for-bit
    # by a DuckDB unrolled-CTE oracle (pipeline/iterative.py). No green
    # row exists, so the hygiene rule forces it in-window; it displaces
    # `events_user_retention` (the events layer keeps SEVEN in-window
    # kins), which keeps its r04 green row and the every-round sweep.
    "kmeans_train_quantized",
    # NEW in late r8: BPE merge-candidate counting (vocab induction,
    # distinct-word weighted — pipeline/corpus.py); displaces
    # `events_rollup_cascade` (events layer keeps SIX in-window kins,
    # r04 green row + sweep stand).
    "corpus_bpe_merges",
    # NEW in late r8: integer-quantized fixed-iteration PageRank over
    # the kNN graph (pipeline/similarity.py — the kmeans_train_quantized
    # exact-integer device applied to message passing); displaces
    # `stream_token_stats` (stream layer keeps THREE in-window kins,
    # r04 green row + sweep stand).
    "graph_pagerank",
    # NEW in late r8: JL projection distortion audit (literal md5-seeded
    # ±1 matrix, shared left folds — pipeline/evaluation.py); displaces
    # `multimodal_resize_bmp` (codec chain keeps THREE in-window kins,
    # r04 green row + sweep stand).
    "eval_jl_distortion",
    # NEW in late r8: mergeable 128-bin histogram quantile sketch
    # (plans/tpch_extra.py — completes the CMS/KMV sketch family);
    # displaces `events_props_json_stats` (events layer keeps FIVE
    # in-window kins, r04 green row + sweep stand).
    "events_quantile_sketch",
    # NEW in late r8: product-quantization encode + codebook balance
    # (pipeline/similarity.py — the IVF-PQ compression audit on the
    # exact-integer device); displaces `events_click_attribution`
    # (events layer keeps FOUR in-window kins, r04 green row + sweep
    # stand).
    "embedding_pq_codebook_stats",
    # NEW in late r8: Bloom-filter ingest prune with measured FP audit
    # (pipeline/sketch.py — the broadcast pre-join membership sketch);
    # displaces `partition_histogram` (table-stats layer keeps SIX
    # in-window kins, r04 green row + sweep stand).
    "dedup_bloom_prune",
    # NEW in late r8: the quantile sketch kept live on the events
    # stream (real stream_value_histogram op run to completion + p50
    # readout, plans/streaming_twins.py); displaces
    # `stream_embedding_neardup` (stream layer keeps THREE in-window
    # kins incl. this one, r04 green row + sweep stand).
    "stream_quantile_sketch",
    # NEW in late r8: per-lang character-budget data selection
    # (pipeline/mixing.py — the N-token training-budget cut); displaces
    # its own sampling-layer kin `sample_temperature`, which keeps its
    # r04 green row + sweep while the layer keeps this in-window
    # representative.
    "sample_char_budget",
    # NEW in late r8: one-pass weighted without-replacement priority
    # sample (pipeline/mixing.py); displaces `duplicate_wins_join`
    # (the join layer keeps manifest_diff, new_table_detection,
    # union_dedup_discovery, exactly_one_guard in-window; r04 green row
    # + sweep stand).
    "sample_priority_weighted",
    # NEW in late r8: PPJoin-style prefix-filtering set-similarity join
    # (pipeline/dedup.py — the third candidate-generation strategy next
    # to the df-capped index and MinHash banding, lossless at its
    # threshold); displaces `dedup_semdedup` (dedup layer keeps
    # dedup_containment, dedup_span_apply, and this one in-window; r04
    # green row + sweep stand).
    "dedup_prefix_filter_pairs",
    # NEW in late r8: PQ search-quality audit — recall@10 of flat-ADC
    # search vs the exact quantized top-10, all-integer distances
    # (pipeline/similarity.py, rides the shared _PQ_BASE_CTES /
    # _pq_parts derivation); displaces `events_funnel_conversion`
    # (events layer keeps THREE in-window kins, r04 green row + sweep
    # stand).
    "eval_pq_recall",
    # NEW in late r8: the IVF-PQ composed search path — coarse-cluster
    # restriction + exact-BIGINT asymmetric-distance top-10 per probe
    # (pipeline/similarity.py, rides _pq_parts + the quantized-centroid
    # argmin); displaces `compaction_backlog` (table-stats layer keeps
    # FIVE in-window kins, r04 green row + sweep stand).
    "similarity_ann_ivf_pq",
    # NEW in late r8: label-propagation communities over the kNN graph
    # (pipeline/similarity.py — the integer modal-vote walk, unrolled
    # 3 rounds, completing the components/PageRank/LPA graph family);
    # displaces `events_asof_click_value` (events layer keeps THREE
    # in-window kins, r04 green row + sweep stand).
    "graph_label_propagation",
    # NEW in late r8: hybrid dense+sparse retrieval fused by exact
    # scaled-integer reciprocal rank fusion (pipeline/corpus.py — rank-
    # space fusion over the persisted LSH index and the token-bucketed
    # posting scratch); displaces `file_size_percentiles` (table-stats
    # layer keeps FIVE in-window kins, r04 green row + sweep stand).
    "retrieval_hybrid_rrf",
    # NEW in late r8: Newman-Girvan modularity audit of the LPA
    # partition in exact integer numerators (pipeline/similarity.py —
    # rides the shared _LPA_CTES/_lpa_labels walk, the graph family's
    # quality gate); displaces `partition_size_distribution`
    # (table-stats layer keeps FOUR in-window kins, r04 green row +
    # sweep stand).
    "eval_community_modularity",
    # NEW in late r8: SCD2 dimension history over the events change log
    # (plans/tpch_extra.py — the lakehouse MERGE/upsert read shape:
    # no-change suppression + versioned validity intervals, two
    # user-partitioned windows, integer-microsecond arithmetic);
    # displaces `top_revenue_supplier` (star-join layer keeps
    # region_segment_profile in-window; r04 green row + sweep stand).
    "events_user_scd2",
    # NEW in late r8: integer-exact EWMA smoothing (plans/tpch_extra.py
    # — the ordered-fold oracle device extended to a multiplicative
    # recurrence, alpha=1/8 in exact cents, per-(type, hour) bounded
    # state); displaces `table_stats_daily` (table-stats layer keeps
    # FOUR in-window kins, r04 green row + sweep stand).
    "events_ewma_quantized",
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
