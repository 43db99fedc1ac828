"""Connected-components semantics (the core of dedup_clusters)."""

from __future__ import annotations

from lakeview_spark.pipeline.clustering import connected_components
from lakeview_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_connected_components_basic(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton edges absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc1", "doc2"]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 30-node chain needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["doc1", "doc2"]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_temperature_sampling_flattens_language_distribution(spark):
    rows = {r.lang: r for r in QUERIES["sample_temperature"](spark, SF_DIR).collect()}
    assert rows, "per-language output must be non-empty"
    total = sum(r.n_docs for r in rows.values())
    # weights are a distribution
    assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-9
    for r in rows.values():
        assert 0.0 < r.sample_rate <= 1.0
        assert 0 <= r.sampled_docs <= r.n_docs
    # temperature flattening: the head language's weight share sits
    # BELOW its corpus share, the smallest language's above
    head = max(rows.values(), key=lambda r: r.n_docs)
    tail = min(rows.values(), key=lambda r: r.n_docs)
    if head.n_docs > tail.n_docs:
        assert head.weight < head.n_docs / total
        assert tail.weight > tail.n_docs / total
    # the md5 threshold draws roughly rate * n_docs documents
    for r in rows.values():
        expected = r.sample_rate * r.n_docs
        assert abs(r.sampled_docs - expected) <= max(5.0, 0.5 * expected), r
