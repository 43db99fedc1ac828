"""Structured Streaming tests: foreachBatch batching with exactly-once
replay, and windowed stats with watermark."""

from __future__ import annotations

import json
import os
from datetime import datetime

from lakeview_spark.streaming import (
    stream_timeline_batches,
    stream_windowed_table_stats,
)


def _write_listing(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _listing_rows(table_id: str, names: list[str], lm: str = "2026-03-01T00:00:00.000Z"):
    return [
        {
            "table_id": table_id,
            "timeline": "active",
            "filename": n,
            "last_modified": lm,
            "is_directory": False,
            "size": 1,
        }
        for n in names
    ]


TRIPLE_100 = ["100.commit.requested", "100.inflight", "100.commit"]
TRIPLE_200 = ["200.deltacommit.requested", "200.deltacommit.inflight", "200.deltacommit"]


def test_stream_timeline_batches_end_to_end(spark, tmp_path):
    listing = str(tmp_path / "listings")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_listing(f"{listing}/l1.json", _listing_rows("t1", TRIPLE_100))

    q = stream_timeline_batches(spark, listing, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    rows = sorted(
        [(r.batch_id, r.seq_in_batch, r.filename) for r in got.collect()]
    )
    assert rows == [
        (1, 0, "100.commit"),
        (1, 1, "100.commit.requested"),
        (1, 2, "100.inflight"),
    ]

    # second trigger with NEW listing file only processes the new data
    _write_listing(f"{listing}/l2.json", _listing_rows("t1", TRIPLE_200))
    q2 = stream_timeline_batches(spark, listing, out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    names = sorted(r.filename for r in got2.collect())
    assert names.count("100.commit") == 1  # not reprocessed (commit log)
    assert "200.deltacommit" in names


def test_stream_windowed_stats_with_watermark(spark, tmp_path):
    listing = str(tmp_path / "wl")
    rows = _listing_rows("t1", TRIPLE_100, lm="2026-03-01T05:00:00.000Z") + _listing_rows(
        "t2", TRIPLE_200, lm="2026-03-02T07:00:00.000Z"
    )
    _write_listing(f"{listing}/l1.json", rows)

    agg = stream_windowed_table_stats(spark, listing, "1 day", "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("winstats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.table_id, str(r.window_start)): (r.file_count, r.total_bytes)
        for r in spark.sql("SELECT * FROM winstats").collect()
    }
    assert got[("t1", "2026-03-01 00:00:00")] == (3, 3)
    assert got[("t2", "2026-03-02 00:00:00")] == (3, 3)


def test_stream_sink_is_idempotent_on_replay(spark, tmp_path):
    """foreachBatch is at-least-once on failure: replaying the same
    micro-batch id must overwrite its own output partition, not append
    duplicates (dynamic partition overwrite on stream_batch_id)."""
    listing = str(tmp_path / "rl")
    out = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rckpt")
    _write_listing(f"{listing}/l1.json", _listing_rows("t1", TRIPLE_100))

    q = stream_timeline_batches(spark, listing, out, ckpt)
    q.awaitTermination(120)
    first = sorted(
        (r.stream_batch_id, r.filename) for r in spark.read.parquet(out).collect()
    )
    assert len(first) == 3

    # Simulate the engine replaying micro-batch 0 after a crash between
    # the sink write and the commit-log write: fresh checkpoint, same
    # input, same batch id -> same output partition rewritten in place.
    q2 = stream_timeline_batches(spark, listing, out, str(tmp_path / "rckpt2"))
    q2.awaitTermination(120)
    replayed = sorted(
        (r.stream_batch_id, r.filename) for r in spark.read.parquet(out).collect()
    )
    assert replayed == first  # no duplicate rows after replay
