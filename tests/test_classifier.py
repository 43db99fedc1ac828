"""Semantic tests for the model-based quality classifier
(pipeline/classifier.py) beyond the oracle-parity harness: the trained
weights must actually discriminate (held-out AUC well above chance),
the ROC must be a valid curve, and the whole chain must be
deterministic under repartitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeview_spark.pipeline.classifier import _clf_scored
from lakeview_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def test_apply_rollup_is_consistent(spark):
    rows = QUERIES["classifier_quality_apply"](spark, SF_DIR).collect()
    assert rows, "apply rollup must be non-empty"
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.min_score <= r.max_score
        assert abs(r.kept_frac - r.n_kept / r.n_docs) < 1e-12
    # the model must not be degenerate: somebody scores negative
    # somewhere and somebody clears the boundary
    assert any(r.min_score < 0 for r in rows)
    assert any(r.n_kept > 0 for r in rows)


def test_roc_is_a_valid_curve_and_auc_beats_chance(spark):
    # at sf0.01 the eval split holds ~125 docs — enough to anchor a ROC
    rows = sorted(
        QUERIES["eval_classifier_roc"](spark, SF_MED).collect(),
        key=lambda r: -r.bin,
    )
    assert rows, "ROC must be non-empty"
    # descending-threshold cumulative rates are monotone non-decreasing
    tprs = [r.tpr for r in rows]
    fprs = [r.fpr for r in rows]
    assert tprs == sorted(tprs)
    assert fprs == sorted(fprs)
    assert abs(tprs[-1] - 1.0) < 1e-12 and abs(fprs[-1] - 1.0) < 1e-12
    # one AUC, constant across rows, in range, and WELL above chance —
    # the held-out generalization proof (reads ~0.75 at sf0.01)
    aucs = {r.auc for r in rows}
    assert len(aucs) == 1
    auc = aucs.pop()
    assert 0.65 <= auc <= 1.0, f"held-out AUC {auc} too close to chance"


def test_scores_are_repartition_invariant(spark):
    """The trained weights + scores are pure hash/count math — the same
    under any physical partitioning (no RNG, no row-order dependence)."""
    a = {r.doc_id: r.score for r in _clf_scored(spark, SF_DIR).collect()}
    b = {
        r.doc_id: r.score
        for r in _clf_scored(spark, SF_DIR).repartition(13).collect()
    }
    assert a == b


def test_holdout_split_is_disjoint_and_both_sides_nonempty(spark):
    scored = _clf_scored(spark, SF_MED)
    counts = {
        r.holdout: r.n
        for r in scored.groupBy("holdout").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "eval"}
    assert counts["train"] > counts["eval"] > 0


def test_perplexity_bigram_matches_pure_python_replay(spark):
    """text_perplexity_bigram == an independent Python replay of the
    quarter-bit interpolated bigram cost at sf0.001 (the VERDICT r10
    next-3 'property-test vs a pure-Python replay' bar), with the r12
    KenLM-style model prune: bigram types below _BIGRAM_MIN_COUNT are
    absent from the model, so those pairs price through the unigram
    backoff with c12 = 0."""
    from collections import Counter

    import pyarrow.parquet as pq

    from lakeview_spark.pipeline.text import _BIGRAM_MIN_COUNT

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    uni, big = Counter(), Counter()
    doc_pairs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.lower().split(" ")
        uni.update(toks)
        prs = list(zip(toks, toks[1:]))
        big.update(prs)
        doc_pairs[doc_id] = prs
    n = sum(uni.values())
    v = len(uni)
    model = {p: c for p, c in big.items() if c >= _BIGRAM_MIN_COUNT}
    bl = lambda x: x.bit_length()  # noqa: E731
    expected = {}
    for doc_id, prs in doc_pairs.items():
        if not prs:
            continue
        q = sum(
            3 * (bl(uni[w1] + v) - bl(model.get((w1, w2), 0) + 1))
            + (bl(n + v) - bl(uni[w2] + 1))
            for w1, w2 in prs
        )
        expected[doc_id] = (len(prs), q)
    got = {
        r.doc_id: (r.n_bigrams, r.total_qbits)
        for r in QUERIES["text_perplexity_bigram"](spark, SF_DIR).collect()
    }
    assert got == expected
    # the prune must actually bind at this scale (otherwise the test is
    # vacuous about the fallback path)
    assert len(model) < len(big)


def test_stream_gate_bucket_default_matches_trainer():
    """stream_classifier_gate's `buckets` default is a literal (the
    streaming module must not import the pipeline package at module
    level — the r10 circular-import rule); this pin keeps it equal to
    the trainer's CLF_BUCKETS so the hashed feature spaces can never
    drift apart."""
    import inspect

    from lakeview_spark.pipeline.classifier import CLF_BUCKETS
    from lakeview_spark.streaming.pipeline_stream import stream_classifier_gate

    sig = inspect.signature(stream_classifier_gate)
    assert sig.parameters["buckets"].default == CLF_BUCKETS


def test_stream_gate_verdicts_match_batch_apply(spark):
    """The live gate's per-lang keep totals must equal the batch apply
    query's — same weights, same score, same boundary (the oracle
    already proves this per window; this folds the windows and checks
    against the independently computed batch rollup)."""
    from pyspark.sql import functions as F

    gate = (
        QUERIES["stream_classifier_gate"](spark, SF_DIR)
        .groupBy("lang")
        .agg(
            F.sum("docs").alias("n_docs"),
            F.sum("kept_docs").alias("n_kept"),
            F.sum("total_score").alias("total_score"),
        )
    )
    batch = QUERIES["classifier_quality_apply"](spark, SF_DIR).select(
        "lang", "n_docs", "n_kept", "total_score"
    )
    g = {r.lang: (r.n_docs, r.n_kept, r.total_score) for r in gate.collect()}
    b = {r.lang: (r.n_docs, r.n_kept, r.total_score) for r in batch.collect()}
    assert g == b


def test_en_stop_literal_matches_curation():
    """classifier._EN_STOP is a literal copy (module docstring: the
    streaming-twin oracle builder imports this module while
    pipeline/__init__ is mid-import, so importing curation here would
    re-enter half-initialized dedup — the r10 rule); this pin is the
    no-drift guarantee the import used to provide."""
    from lakeview_spark.pipeline.classifier import _EN_STOP as clf_stop
    from lakeview_spark.pipeline.curation import _EN_STOP as cur_stop

    assert clf_stop == cur_stop
