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


def test_layout_zorder_stats_replay_and_pruning_win(spark):
    """Pure-Python replay of the z-order telemetry query (range
    normalization, Morton interleave, both bucketings, exact spans) and
    the claim it exists to measure: mean bounding-box area per bucket
    is materially smaller under z-order than under time-linear
    bucketing, while linear keeps near-full user spans."""
    import duckdb

    from lakeview_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["layout_zorder_stats"](spark, sf).collect()
    evs = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    umn, umx = min(u for u, _ in evs), max(u for u, _ in evs)
    vmn, vmx = min(v for _, v in evs), max(v for _, v in evs)

    def interleave(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    boxes: dict = {}
    for u, v in evs:
        nu = ((u - umn) * 65535) // max(umx - umn, 1)
        nv = ((v - vmn) * 65535) // max(vmx - vmn, 1)
        z = interleave(nu, nv)
        for key in (("zorder", z // 4194304), ("linear", nv // 64)):
            st = boxes.setdefault(key, [0, nu, nu, nv, nv])
            st[0] += 1
            st[1], st[2] = min(st[1], nu), max(st[2], nu)
            st[3], st[4] = min(st[3], nv), max(st[4], nv)
    assert {(r.layout, r.bucket) for r in rows} == set(boxes)
    for r in rows:
        n, numn, numx, nvmn, nvmx = boxes[(r.layout, r.bucket)]
        assert (r.n_rows, r.u_span, r.v_span) == (n, numx - numn, nvmx - nvmn)
    # the pruning win. NOT mean box area — 1024 buckets partition the
    # same 65536^2 space under either layout, so mean area is
    # layout-invariant. The win is the SHAPE: z-order bounds the user
    # span per bucket (linear buckets span every user), so a query box
    # constrained in BOTH dimensions intersects far fewer buckets.
    def mean_span(layout, field):
        sel = [getattr(r, field) for r in rows if r.layout == layout]
        return sum(sel) / len(sel)

    assert mean_span("zorder", "u_span") < 0.1 * mean_span("linear", "u_span")
    # a centered 4096x4096 query box under min/max pruning
    lo, hi = 30720, 34816
    def buckets_hit(layout):
        # replay per-bucket boxes (exact), count intersecting buckets
        return sum(
            1
            for (lay, _), (_, numn, numx, nvmn, nvmx) in boxes.items()
            if lay == layout and numx >= lo and numn <= hi
            and nvmx >= lo and nvmn <= hi
        )

    assert buckets_hit("zorder") < buckets_hit("linear")
