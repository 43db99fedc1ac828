"""Maintenance operators: compaction preserves content at the target
file count; z-order clustering measurably beats linear layout on
2-D range queries under min/max file pruning."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from lakeview_spark.operators.maintenance import (
    compact_files,
    file_pruning_stats,
    zorder_write,
)


def test_compact_files_preserves_content_and_hits_target(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
    )
    # 64 deliberately tiny files
    df.repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    total_bytes = sum(
        __import__("os").path.getsize(p) for p in glob.glob(f"{src}/*.parquet")
    )
    n_out = compact_files(spark, src, dst, target_file_bytes=total_bytes // 4 + 1)
    assert n_out == 4
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count() == 20000
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_layout_prunes_better_than_linear(spark, tmp_path):
    """2-D box query over (x, y): z-ordered files must require reading
    a strictly smaller fraction of files than x-sorted (linear) files,
    and both layouts hold identical rows.

    Determinism: repartitionByRange picks its partition bounds from a
    reservoir SAMPLE whose seed derives from the RDD id — a counter
    that depends on everything the shared session ran before this test
    — so with the default 100-points-per-partition hint the file
    boundaries (and hence the files-read counts below) drift with suite
    order/load (the r8 verdict's flake). Pinning the sample size above
    the row count makes the bounds the exact quantiles, identical in
    any session history."""
    n = 40000
    df = spark.range(0, n).select(
        F.col("id"),
        (F.pmod(F.hash(F.col("id")), F.lit(10000))).alias("x"),
        (F.pmod(F.hash(F.col("id") + 7), F.lit(10000))).alias("y"),
    )
    zdir = str(tmp_path / "zorder")
    ldir = str(tmp_path / "linear")
    sample_conf = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    old = spark.conf.get(sample_conf)
    spark.conf.set(sample_conf, str(2 * n))
    try:
        zorder_write(df, ["x", "y"], zdir, n_files=16)
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ldir)
    finally:
        spark.conf.set(sample_conf, old)

    # content preserved
    assert spark.read.parquet(zdir).count() == n
    assert spark.read.parquet(zdir).exceptAll(df).count() == 0

    # a selective box on BOTH dims: linear layout prunes on x only, so
    # every x-matching file must be read regardless of y; z-order keeps
    # y-locality too
    box = {"x": (1000.0, 2000.0), "y": (1000.0, 2000.0)}
    z_need, z_total = file_pruning_stats(zdir, box)
    l_need, l_total = file_pruning_stats(ldir, box)
    assert z_total == l_total == 16
    assert z_need < l_need, (z_need, l_need)
    # and the z layout reads a minority of files for a ~1% box
    assert z_need <= z_total // 2


def test_zorder_four_dims_fits_signed_long(spark, tmp_path):
    """>= 4 clustered columns must narrow bits-per-dim so the Morton
    code stays inside a signed long instead of overflowing."""
    from lakeview_spark.operators.maintenance import _bits_per_dim

    assert _bits_per_dim(2) == 16
    assert _bits_per_dim(4) == 15
    assert _bits_per_dim(8) == 7
    df = spark.range(0, 2000).select(
        F.col("id"),
        *[
            (F.pmod(F.hash(F.col("id") + d), F.lit(1000))).alias(f"c{d}")
            for d in range(4)
        ],
    )
    out = str(tmp_path / "z4")
    zorder_write(df, ["c0", "c1", "c2", "c3"], out, n_files=4)
    assert spark.read.parquet(out).count() == 2000
