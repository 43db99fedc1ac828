"""Semantic tests for eval_retrieval_ndcg beyond oracle parity: NDCG
bounds, the ideal-ranking invariant (dcg <= idcg), probe completeness
(no silent empty-bucket drop), and the discount table's exactness."""

from __future__ import annotations

import math

from lakeview_spark.pipeline.evaluation import (
    _NDCG_D,
    _NDCG_K,
    _NDCG_P,
    _NDCG_SCALE,
)
from lakeview_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_discount_table_is_the_floored_log2_discount():
    assert len(_NDCG_D) == _NDCG_K
    for i, d in enumerate(_NDCG_D, start=1):
        assert d == int(_NDCG_SCALE / math.log2(i + 1))
    # discounts strictly decrease; prefix sums strictly increase
    assert all(a > b for a, b in zip(_NDCG_D, _NDCG_D[1:]))
    assert _NDCG_P == [sum(_NDCG_D[: j + 1]) for j in range(_NDCG_K)]


def test_ndcg_rows_are_bounded_and_complete(spark):
    rows = QUERIES["eval_retrieval_ndcg"](spark, SF_DIR).collect()
    assert rows, "probe set must be non-empty"
    # every probe id in the stride appears — including empty buckets
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    mod = max(1, n // 10)
    expected_probes = {v for v in range(0, n) if v % mod == 0}
    assert {r.probe_id for r in rows} == expected_probes
    for r in rows:
        assert 0 <= r.n_relevant_retrieved <= r.n_retrieved <= _NDCG_K
        if r.n_relevant_total > 0:
            assert r.idcg_num == _NDCG_P[min(_NDCG_K, r.n_relevant_total) - 1]
            assert 0 <= r.dcg_num <= r.idcg_num
            assert abs(r.ndcg - r.dcg_num / r.idcg_num) < 1e-12
            assert 0.0 <= r.ndcg <= 1.0
        else:
            assert r.ndcg is None and r.idcg_num is None


def test_dcg_matches_pure_python_on_each_probe(spark):
    """Recompute dcg_num from the per-rank gains independently: gains
    are recoverable from (n_relevant_retrieved == sum of gains) only in
    aggregate, so replay the whole ranking in python via the registered
    candidates logic is overkill — instead assert the accounting
    identity dcg_num == 0 iff n_relevant_retrieved == 0 and that any
    relevant retrieval earns at least the rank-k discount."""
    rows = QUERIES["eval_retrieval_ndcg"](spark, SF_DIR).collect()
    for r in rows:
        if r.n_relevant_retrieved == 0:
            assert r.dcg_num == 0
        else:
            assert r.dcg_num >= r.n_relevant_retrieved * _NDCG_D[-1]
            assert r.dcg_num <= sum(_NDCG_D[: r.n_relevant_retrieved])


def test_rq_refinement_lifts_the_flat_adc_ceiling(spark):
    """eval_rq_recall's reason to exist: the residual stage must lift
    flat-ADC recall@10 past the stage-1 codebook ceiling (VERDICT r10
    next-8 bar: >= 0.75 at sf0.01; reads ~0.91 vs base ~0.73)."""
    rows = QUERIES["eval_rq_recall"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    base = sum(r.base_recall for r in rows) / len(rows)
    refined = sum(r.refined_recall for r in rows) / len(rows)
    assert 0.0 <= base <= 1.0 and 0.0 <= refined <= 1.0
    assert refined >= 0.75, f"refined flat-ADC recall {refined} below the bar"
    assert refined > base + 0.05, (
        f"refinement must materially beat the stage-1 ceiling "
        f"(base {base}, refined {refined})"
    )
    for r in rows:
        assert 0 <= r.base_hits <= 10 and 0 <= r.refined_hits <= 10
