"""Connected-components semantics (the core of dedup_clusters)."""

from __future__ import annotations

from lakeview_spark.pipeline.clustering import connected_components


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
