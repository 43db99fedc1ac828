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

# Round-3 window: 14 cross-round sentinels (r01+r02 double-green,
# spanning every module family — these re-verify code shared with the
# queries under first check, e.g. the materialize layer), then the 33
# queries with no green driver row after r02, then the 3 queries new in
# r03. See COVERAGE.md "driver verification" column.
_DRIVER_WINDOW = [
    # sentinels (green r01+r02; unchanged semantics)
    "timeline_parse",
    "checkpoint_filter",
    "uuid3_table_ids",
    "partition_skew",
    "archived_batching",
    "pricing_summary",
    "events_sessionization",
    "timeline_search",
    "table_health_summary",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "similarity_topk_cosine",
    # similarity / embedding tail (never driver-checked, or stale)
    "similarity_lsh_buckets",
    "similarity_ann_ivf",
    "similarity_ann_multiprobe",
    "embedding_centroid_assign",
    "embedding_centroid_stats",
    "dedup_embedding_cosine",
    "similarity_knn_graph",
    # text + multimodal
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_metadata",
    # clustering / sampling
    "dedup_clusters",
    "dedup_apply",
    "sample_stratified",
    "dedup_cluster_stats",
    # corpus statistics + sketches
    "corpus_top_tokens",
    "corpus_bigram_counts",
    "corpus_cube_stats",
    "corpus_bigram_cohesion",
    "text_tfidf_top_terms",
    "minhash_similarity_estimate",
    "corpus_distinct_kmv",
    # curation
    "contamination_ngram_overlap",
    "text_repetition_score",
    "quality_filter_funnel",
    "dedup_simhash_hamming_pairs",
    "dedup_incremental_lsh",
    "quality_filter_apply",
    # evaluation
    "eval_language_id_confusion",
    "eval_lsh_precision_recall",
    "eval_dedup_reduction",
    "eval_lsh_bucket_health",
    # new in round 3
    "eval_embedding_bucket_health",
    "eval_simhash_band_quality",
    "multimodal_decode_bmp",
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
