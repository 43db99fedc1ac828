"""binaryFile content source (S6) + mirror integrity verification."""

from __future__ import annotations

import os

from lakeview_spark.sources.content import read_file_contents, verify_mirror


def test_read_file_contents(spark, tmp_path):
    d = tmp_path / "tl"
    d.mkdir()
    (d / "100.commit").write_text("payload-a")
    (d / "200.commit").write_text("payload-b")
    (d / "ignore.txt").write_text("junk")

    df = read_file_contents(spark, str(d), path_filter="*.commit")
    rows = {r.filename: r for r in df.collect()}
    assert set(rows) == {"100.commit", "200.commit"}
    assert rows["100.commit"].length == len(b"payload-a")
    assert bytes(rows["100.commit"].content) == b"payload-a"
    assert len(rows["100.commit"].content_sha256) == 64


def test_verify_mirror_detects_missing_and_corrupt(spark, tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    (src / "a.commit").write_text("same")
    (dst / "a.commit").write_text("same")
    (src / "b.commit").write_text("original")
    (dst / "b.commit").write_text("CORRUPT")
    (src / "c.commit").write_text("missing-from-mirror")

    bad = {r.filename: r for r in verify_mirror(spark, str(src), str(dst)).collect()}
    assert set(bad) == {"b.commit", "c.commit"}
    assert bad["c.commit"].dst_sha is None
    assert bad["b.commit"].src_sha != bad["b.commit"].dst_sha
