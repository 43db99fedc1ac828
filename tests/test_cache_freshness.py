"""Cross-session index-freshness audit (r13, VERDICT r12 next-10): every
fingerprint-keyed driver cache — the materialized-scratch registry, the
corpus-count/LSH-plane metadata caches, the trained PQ/RQ codebooks and
IVF coarse centroids — must invalidate when the dataset CHANGES, so a
stale index can never silently serve a refreshed corpus. The test
builds every cached artifact against a copied dataset, mutates ONE row
(rewriting one parquet file: new mtime + bytes -> new
_dataset_fingerprint), rebuilds, and asserts each cache now holds a
SECOND key for the same path (old fingerprint retained, new one added)
and that content-derived scratch actually reflects the mutation."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# slow tier (deselected by the default "-m not slow" addopts; the
# builder's close battery runs the full suite with -m "slow or not
# slow"): end-to-end / property-simulation coverage that exceeds the
# round driver's pytest budget — correctness gating lives in
# test_oracle_parity + the hygiene/golden suites, which stay fast
pytestmark = pytest.mark.slow


SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from lakeview_spark.session import get_spark

    return get_spark()


def _keys_for(cache: dict, d: str) -> set:
    rp = os.path.realpath(d)
    return {k for k in cache if rp in k}


def _build_all(spark, d: str):
    from lakeview_spark.pipeline.dedup import _doc_shingles
    from lakeview_spark.pipeline.similarity import (
        _ivfpq_coarse_parts,
        _pq_emb,
        _plane_vectors,
        corpus_n,
        pq_codes_materialized,
        rq_codes_materialized,
    )

    _doc_shingles(spark, d).count()
    corpus_n(spark, d)
    _plane_vectors(spark, d)
    pq_codes_materialized(spark, d).count()
    rq_codes_materialized(spark, d).count()
    _ivfpq_coarse_parts(spark, d, _pq_emb(spark, d))[1].count()


def test_changed_corpus_invalidates_every_cache(spark, tmp_path):
    from lakeview_spark.operators.materialize import _MATERIALIZED
    from lakeview_spark.pipeline import similarity as sim

    d = str(tmp_path / "data")
    os.makedirs(d)
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), os.path.join(d, f))

    caches = {
        "materialized": _MATERIALIZED,
        "corpus_n": sim._N_CACHE,
        "lsh_planes": sim._PLANE_CACHE,
        "pq_codebook": sim._PQ_CB_CACHE,
        "rq_codebook": sim._RQ_CB_CACHE,
        "ivfpq_centroids": sim._IVFPQ_CENTS_CACHE,
    }

    _build_all(spark, d)
    before = {name: _keys_for(c, d) for name, c in caches.items()}
    for name, keys in before.items():
        assert keys, f"{name}: no cache entry built for the dataset"

    # shingle content for doc 0 before the mutation
    from lakeview_spark.pipeline.dedup import _doc_shingles

    sh0 = (
        _doc_shingles(spark, d).filter("doc_id = 0").collect()[0].shingles
    )

    # mutate ONE row: rewrite documents.parquet with doc 0's text changed
    p = os.path.join(d, "documents.parquet")
    tbl = pq.read_table(p)
    cols = {n: tbl.column(n).to_pylist() for n in tbl.column_names}
    cols["text"][0] = "mutated corpus row zero " + cols["text"][0]
    pq.write_table(
        pa.table(cols, schema=tbl.schema), p
    )

    _build_all(spark, d)
    after = {name: _keys_for(c, d) for name, c in caches.items()}
    for name in caches:
        fresh = after[name] - before[name]
        assert fresh, (
            f"{name}: no NEW cache key after the dataset changed — a "
            f"stale artifact would serve the refreshed corpus"
        )

    # the rebuilt scratch reflects the mutation (not just a new key)
    sh0_new = (
        _doc_shingles(spark, d).filter("doc_id = 0").collect()[0].shingles
    )
    assert sh0_new != sh0
    assert any(s.startswith("mutated corpus") for s in sh0_new)
