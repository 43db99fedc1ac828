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


def test_graph_kcore_peel_replay_and_laws(spark):
    """Pure-Python replay of the 3-round onion peeling toward the
    4-core over the symmetrized kNN graph, plus the laws: every
    layer-1 vertex started under-degree (degree0 < K); a vertex's layer
    is the FIRST round its within-subgraph degree dropped below K; and
    the layering is non-trivial on this corpus (>= 2 layers present)."""
    from collections import defaultdict

    from lakeview_spark.pipeline.similarity import _KCORE_K, _KCORE_ROUNDS
    from lakeview_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = {r.vec_id: r for r in QUERIES["graph_kcore"](spark, sf).collect()}
    edges = {
        (r.src, r.dst)
        for r in QUERIES["similarity_knn_graph"](spark, sf)
        .select("src", "dst")
        .collect()
    }
    sym = edges | {(b, a) for a, b in edges}
    adj = defaultdict(set)
    for a, b in sym:
        adj[a].add(b)
    alive = set(rows)
    layer = {v: 0 for v in rows}
    for rnd in range(1, _KCORE_ROUNDS + 1):
        deg = {v: sum(1 for u in adj[v] if u in alive) for v in alive}
        peeled = {v for v in alive if deg[v] < _KCORE_K}
        for v in peeled:
            layer[v] = rnd
        alive -= peeled
    final_deg = {v: sum(1 for u in adj[v] if u in alive) for v in alive}
    for v, r in rows.items():
        assert r.degree0 == len(adj[v])
        assert r.peel_layer == layer[v]
        assert r.core_degree == final_deg.get(v, 0)
        if r.peel_layer == 1:
            assert r.degree0 < _KCORE_K
    assert len({r.peel_layer for r in rows.values()}) >= 2
