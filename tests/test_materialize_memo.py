"""Focused pins for the materialized-read memo (r15): `materialized()`
hands every consumer the SAME read-back DataFrame object per
(session, name, dataset fingerprint) — `spark.read.parquet` costs a
driver round-trip per call, and scratch-heavy build chains (the gANN
family) re-opened the tables they had just written a dozen times per
execution. The memo must never outlive its key: cleanup purges it with
the path, and a rewritten dataset gets a fresh key, so a stale frame
can never serve a refreshed corpus."""

from __future__ import annotations

import os
import shutil

import pytest

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from lakeview_spark.session import get_spark

    return get_spark()


def _tiny_builder(spark, sf_dir):
    from pyspark.sql import functions as F

    from lakeview_spark.plans.registry import t

    return t(spark, sf_dir, "region").select("r_regionkey", F.length("r_name").alias("n"))


def test_read_memo_identity_invalidation_and_cleanup(spark, tmp_path):
    from lakeview_spark.operators.materialize import (
        _MATERIALIZED,
        _READ_CACHE,
        _cleanup_scratch,
        materialized,
    )

    d = str(tmp_path / "data")
    os.makedirs(d)
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), os.path.join(d, f))

    a = materialized(spark, "memo_pin", d, _tiny_builder)
    b = materialized(spark, "memo_pin", d, _tiny_builder)
    # same key -> same object: no second listing/footer round-trip
    assert a is b
    rows_before = sorted(r.r_regionkey for r in a.collect())

    # a dataset rewrite (new mtime+bytes -> new fingerprint) must MISS
    # the memo: new scratch, new frame, same rows. Grow a table the
    # builder does NOT read so the fingerprint moves without touching
    # the builder's input.
    other = os.path.join(d, "nation.parquet")
    with open(other, "ab") as fh:  # appended byte changes dir size+mtime
        fh.write(b"\x00")
    c = materialized(spark, "memo_pin", d, _tiny_builder)
    assert c is not a
    assert sorted(r.r_regionkey for r in c.collect()) == rows_before

    # cleanup drops the memo entries together with the paths/keys
    keys = [k for k in _MATERIALIZED if k[1] == "memo_pin"]
    paths = [_MATERIALIZED[k] for k in keys]
    assert any(k in _READ_CACHE for k in keys)
    _cleanup_scratch(paths)
    assert not any(k in _MATERIALIZED for k in keys)
    assert not any(k in _READ_CACHE for k in keys)
