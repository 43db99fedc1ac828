"""Sized-export tests: file counts respect the target budget in both
directions (tiny results coalesce; large results split)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from lakeview_spark.pipeline.export import estimate_row_bytes, write_sized


def _data_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f) != "_SUCCESS"
    ]


def test_small_result_coalesces_to_one_file(spark, tmp_path):
    df = spark.range(100).select(F.col("id"), F.lit("x").alias("v"))
    out = str(tmp_path / "small")
    info = write_sized(df, out, target_mb=64)
    assert info["rows"] == 100
    assert info["n_partitions"] == 1
    assert len(_data_files(out)) == 1
    assert spark.read.parquet(out).count() == 100


def test_large_result_splits_by_record_cap(spark, tmp_path):
    # force a tiny target so the row cap bites: ~100-byte rows, target
    # scaled down via a small max_records derived from wide payloads
    df = spark.range(10_000).select(
        F.col("id"), F.repeat(F.lit("payload "), 200).alias("blob")
    )
    out = str(tmp_path / "large")
    info = write_sized(df, out, target_mb=1)
    files = _data_files(out)
    assert info["max_records_per_file"] < 10_000
    assert len(files) > 1, info
    assert spark.read.parquet(out).count() == 10_000


def test_partitioned_write_keeps_partition_columns(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("bucket"), F.lit("x").alias("v")
    )
    out = str(tmp_path / "parts")
    write_sized(df, out, target_mb=64, partition_by=("bucket",))
    assert sorted(os.listdir(out))[:1] == ["_SUCCESS"] or any(
        d.startswith("bucket=") for d in os.listdir(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "bucket", "v"}


def test_row_size_estimate_bounded(spark):
    df = spark.range(1_000_000).select(F.col("id"))
    # must not scan the full table: bounded sample only
    est = estimate_row_bytes(df, sample_rows=100)
    assert 1 <= est <= 64


def test_no_coalesce_skips_the_exact_count(spark, tmp_path):
    df = spark.range(1000).select(F.col("id"))
    out = str(tmp_path / "nocount")
    info = write_sized(df, out, target_mb=64, coalesce_small=False)
    # sizing used only the bounded sample: no full second evaluation
    assert info["rows"] is None and info["n_partitions"] is None
    assert spark.read.parquet(out).count() == 1000


def test_webdataset_shards_are_complete_and_reproducible(spark, tmp_path):
    import glob
    import hashlib
    import tarfile

    from lakeview_spark.pipeline.export import write_webdataset

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out1 = str(tmp_path / "wds1")
    n_shards = write_webdataset(docs, out1, samples_per_shard=20)
    tars = sorted(glob.glob(f"{out1}/shard-*.tar"))
    assert len(tars) == n_shards

    # every sample present exactly once, payloads intact
    seen = {}
    for path in tars:
        with tarfile.open(path) as tf:
            for m in tf.getmembers():
                key = int(m.name.split(".")[0])
                seen[key] = tf.extractfile(m).read().decode("utf-8")
    truth = {r.doc_id: r.text for r in docs.collect()}
    assert seen == truth

    # byte-level reproducibility: a second export produces identical tars
    out2 = str(tmp_path / "wds2")
    assert write_webdataset(docs, out2, samples_per_shard=20) == n_shards
    for p1 in tars:
        p2 = p1.replace(out1, out2)
        h1 = hashlib.md5(open(p1, "rb").read()).hexdigest()
        h2 = hashlib.md5(open(p2, "rb").read()).hexdigest()
        assert h1 == h2, p1
