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

# Round-13 window (COVERAGE.md "Round-13 plan", written at r12 close,
# executed + amended in-round): the r12 window rotates out (50 green
# rows earned). The 50 slots: `kmeans_train` (the permanent rows-only
# exemption), the queries NEW or CHANGED in r13 (the paragraph-ppl
# pair; the overflow-guarded cross-multiplication trio + the
# HUGEINT-oracle markov; the single-pass Jaccard-index /
# stored-n_shingles restructure and every query whose engine lineage
# rides those builders; the flag-extended train-set funnel; the
# refactored-LM perplexity gate), then the FULL 29-query r08-stale
# cohort (every query whose newest green driver row is
# CORRECTNESS_r08 — clears the "no row older than r09" bar the r12
# verdict re-set; CORRECTNESS_r08 order), then the oldest r09-green
# query in CORRECTNESS_r09 order. Later r13 additions displace the
# r09 top-up first, then amend here.
_DRIVER_WINDOW = [
    # the single permanent rows-only exemption (iterative float-mean)
    "kmeans_train",
    # NEW in r13 (VERDICT r12 next-9): CCNet paragraph-granular
    # perplexity buckets + the kept-paragraph reassembly apply
    "text_paragraph_ppl",
    "text_paragraph_apply",
    # CHANGED in r13 (VERDICT r12 next-8): exact-range raise/rescale
    # guards on the BIGINT cross-multiplications
    "corpus_source_similarity",
    "eval_classifier_calibration",
    "stream_drift_monitor",
    # CHANGED in r13 (ADVICE r12): oracle per-edge mass product in
    # HUGEINT (engine walk unchanged, arbitrary precision)
    "events_attribution_markov",
    # CHANGED in r13 (VERDICT r12 next-5): single-pass posting-collapse
    # index build + stored n_shingles — every query whose engine
    # lineage reads the restructured builders re-earns its row
    "dedup_ngram_jaccard",
    "text_ngram_novelty",
    "contamination_ngram_overlap",
    "contamination_apply",
    "eval_lsh_precision_recall",
    "eval_lsh_scurve",
    "eval_dedup_reduction",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "minhash_similarity_estimate",
    # CHANGED in r13: shared-LM refactor (module-level builders feed
    # both the doc gate and the paragraph twins)
    "text_perplexity_bigram",
    # NEW in r13 (late-round): graph-based ANN — greedy beam search
    # over the navigable graph (capped multiprobe-local links + reverse
    # links + hub up/down/mesh + the id-stride sparse layer) and its
    # recall audit. Displace `multimodal_frame_sample`
    # (the r09 top-up; its r09 row stands) and `pipeline_train_set`
    # (r13-changed only by the paragraph_filter FLAG — the default
    # path is expression-identical, pytest pins the flag branch, and
    # the every-round sweep covers the registered query)
    "similarity_ann_graph",
    "eval_graph_ann_recall",
    # NEW in r13 (late-round): live CCNet paragraph gate twin
    # (displaces `dedup_incremental_lsh` — r12-green, its r13 change is
    # the most indirect of the shingle-builder riders (it reads the
    # minhash signature scratch one layer removed) and the every-round
    # sweep covers it)
    "stream_paragraph_gate",
    # the FULL r08-stale cohort — every query whose newest green row
    # is CORRECTNESS_r08, in CORRECTNESS_r08 order (dedup_containment,
    # dedup_span_apply, dedup_prefix_filter_pairs are ALSO r13-changed
    # via the shared builders — their slots serve both purposes)
    "timeline_trends",
    "top_partitions",
    "union_dedup_discovery",
    "text_language_id",
    "text_quality_score",
    "text_repetition_score",
    "text_tfidf_top_terms",
    "corpus_bigram_counts",
    "corpus_bigram_cohesion",
    "multimodal_decode_bmp",
    "dedup_containment",
    "dedup_span_apply",
    "active_batch_packing",
    "checkpoint_lookback",
    "kmeans_train_quantized",
    "corpus_bpe_merges",
    "graph_pagerank",
    "eval_jl_distortion",
    "events_quantile_sketch",
    "dedup_bloom_prune",
    "stream_quantile_sketch",
    "sample_char_budget",
    "sample_priority_weighted",
    "dedup_prefix_filter_pairs",
    "graph_label_propagation",
    "retrieval_hybrid_rrf",
    "eval_community_modularity",
    "events_user_scd2",
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
