"""Persist-once materialization for shared intermediate tables.

Several pipeline queries share an expensive intermediate (the MinHash
signature table, the embedding LSH-bucket table). Referencing the
builder DataFrame from multiple consumers — or from both sides of a
self-join — makes Spark recompute the whole lineage per reference, and
an in-query ``.cache()`` is worse (it leaks one cached copy per
invocation and the broadcast build races the probe side; see round-1
notes). The scale-correct pattern is the one real pipelines use: write
the intermediate to a scratch table once per (session, dataset), then
read it back everywhere — each consumer's lineage starts at a parquet
scan instead of the full recompute.

Locally the scratch location is the driver temp dir; on a cluster the
same code points at a shared scratch prefix (object-store temp path)
via ``LAKEVIEW_SCRATCH_DIR``.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# (application id, logical name, dataset path, dataset fingerprint)
# -> materialized path. The driver runs queries sequentially in one
# session, so a plain dict guard is sufficient; a second session (new
# app id) or a rewritten dataset (new fingerprint) re-materializes.
_MATERIALIZED: dict[tuple[str, str, str, str], str] = {}

# scratch paths this process created, removed at interpreter exit so
# repeated runs don't accumulate stale parquet under the scratch root
_CREATED_PATHS: list[str] = []

# (materialize key) -> the read-back DataFrame. `spark.read.parquet`
# costs a driver round-trip (file listing + footer schema read) PER
# CALL; a build chain that references several scratch tables a dozen
# times (the gANN family) pays ~1 s of pure driver latency per
# execution re-opening tables this module just wrote. DataFrames are
# immutable plan holders, so handing every consumer the same object is
# safe — the t() source-table memo (plans/registry.py), scratch-side.
# Entries die with their _MATERIALIZED key (same cleanup path).
_READ_CACHE: dict[tuple[str, str, str, str], DataFrame] = {}


def scratch_dir() -> str:
    return os.environ.get("LAKEVIEW_SCRATCH_DIR", tempfile.gettempdir())


def _dataset_fingerprint(sf_dir: str) -> str:
    """Cheap invalidation key: newest mtime + total bytes over the
    dataset directory. One local stat sweep over ~10 files here; on an
    object store the equivalent is one LIST of the input root (already
    paid by any run). Non-local / missing paths fall back to a constant
    (the per-session application-id key still bounds staleness)."""
    if not os.path.isdir(sf_dir):
        return "remote"
    newest = 0
    total = 0
    for root, _, files in os.walk(sf_dir):
        for fn in files:
            try:
                st = os.stat(os.path.join(root, fn))
            except OSError:
                continue
            newest = max(newest, st.st_mtime_ns)
            total += st.st_size
    return f"{newest}:{total}"


def _cleanup_scratch(paths: list[str] | None = None) -> None:
    """Remove scratch paths AND their cache entries together — disk and
    the `_MATERIALIZED` dict must never disagree, or a later cache hit
    reads a deleted directory (round-3 regression). `paths=None` cleans
    everything this process created (the atexit hook); passing a subset
    cleans only those paths."""
    targets = _CREATED_PATHS if paths is None else [p for p in paths if p in _CREATED_PATHS]
    for path in list(targets):
        shutil.rmtree(path, ignore_errors=True)
        _CREATED_PATHS.remove(path)
        for key in [k for k, v in _MATERIALIZED.items() if v == path]:
            del _MATERIALIZED[key]
            _READ_CACHE.pop(key, None)


atexit.register(_cleanup_scratch)


def materialized(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    builder: Callable[[SparkSession, str], DataFrame],
) -> DataFrame:
    """Return `builder(spark, sf_dir)` materialized as parquet, writing it
    only on the first call per (session, name, dataset version) — the
    dataset fingerprint in the key means a rewritten input directory
    re-materializes instead of serving stale scratch.

    Parquet round-trips every type the intermediates use (string, long,
    int, array) exactly, so oracle hash-parity is unaffected.
    """
    key = (
        spark.sparkContext.applicationId,
        name,
        os.path.realpath(sf_dir),
        _dataset_fingerprint(sf_dir),
    )
    path = _MATERIALIZED.get(key)
    if path is None:
        digest = hashlib.md5(repr(key).encode()).hexdigest()[:12]
        path = os.path.join(scratch_dir(), f"lakeview_mat_{name}_{digest}")
        builder(spark, sf_dir).write.mode("overwrite").parquet(path)
        _MATERIALIZED[key] = path
        _CREATED_PATHS.append(path)
    got = _READ_CACHE.get(key)
    if got is None:
        got = spark.read.parquet(path)
        _READ_CACHE[key] = got
    return got


# default bucket count for bucketed scratch tables: matches the local
# core count; on a cluster it's a config knob sized to executor count
N_SCRATCH_BUCKETS = 32


def materialized_bucketed(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    builder: Callable[[SparkSession, str], DataFrame],
    bucket_cols: list[str],
    n_buckets: int = N_SCRATCH_BUCKETS,
) -> DataFrame:
    """Like :func:`materialized`, but the scratch table is written
    bucketed (and sorted) on ``bucket_cols`` via ``saveAsTable`` with an
    explicit path, and read back through the catalog so Spark keeps the
    bucketing metadata. Consumers that equi-join or self-join on the
    bucket columns then plan NO Exchange on either side — at 100 TB the
    signature/index self-joins become a zero-shuffle sort-merge over
    co-located buckets, which is the point of persisting them at all.

    The catalog entry lives in the session's in-memory catalog (unique
    name per (session, dataset fingerprint)), so separate driver
    processes rebuild their own — same lifecycle as the plain parquet
    scratch; `_cleanup_scratch` removing the path at exit is sufficient
    because the catalog dies with the session.
    """
    key = (
        spark.sparkContext.applicationId,
        f"bucketed_{name}",
        os.path.realpath(sf_dir),
        _dataset_fingerprint(sf_dir),
    )
    path = _MATERIALIZED.get(key)
    digest = hashlib.md5(repr(key).encode()).hexdigest()[:12]
    table = f"lakeview_mat_{name}_{digest}"
    if path is None:
        path = os.path.join(scratch_dir(), f"lakeview_mat_{name}_{digest}")
        (
            # repartition on the bucket columns first: Spark's bucketing
            # and repartition share the same hash partitioning, so each
            # task then owns exactly one bucket and the write emits
            # n_buckets files instead of (input partitions × buckets)
            # small files — the standard bucketed-write alignment trick
            builder(spark, sf_dir)
            .repartition(n_buckets, *bucket_cols)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .option("path", path)
            .saveAsTable(table)
        )
        _MATERIALIZED[key] = path
        _CREATED_PATHS.append(path)
    got = _READ_CACHE.get(key)
    if got is None:
        got = spark.table(table)
        _READ_CACHE[key] = got
    return got
