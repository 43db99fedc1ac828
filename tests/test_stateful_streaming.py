"""applyInPandasWithState: incomplete-commit tracker across micro-batches."""

from __future__ import annotations

import json
import os

from lakeview_spark.streaming.stateful import track_incomplete_commits
from lakeview_spark.streaming.timeline_stream import timeline_file_stream


def _write(path, table_id, names):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for n in names:
            f.write(
                json.dumps(
                    {
                        "table_id": table_id,
                        "timeline": "active",
                        "filename": n,
                        "last_modified": "2026-03-01T00:00:00.000Z",
                        "is_directory": False,
                        "size": 1,
                    }
                )
                + "\n"
            )


def _run(spark, listing, ckpt, out_dir, tag):
    stream = timeline_file_stream(spark, listing)
    out = track_incomplete_commits(stream)

    def sink(batch_df, batch_id):
        import pyspark.sql.functions as F

        batch_df.withColumn("tag", F.lit(tag)).write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).filter(f"tag = '{tag}'").collect()
    return {r.table_id: r for r in rows}


def test_incomplete_commit_tracker_across_batches(spark, tmp_path):
    listing = str(tmp_path / "l")
    ckpt = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    # batch 1: commit 100 complete, commit 300 open (requested+inflight)
    _write(
        f"{listing}/b1.json",
        "t1",
        ["100.commit.requested", "100.inflight", "100.commit",
         "300.clean.requested", "300.clean.inflight"],
    )
    got = _run(spark, listing, ckpt, out_dir, "s1")
    r = got["t1"]
    assert r.open_commits == 1
    assert r.first_incomplete == "299"
    assert r.completed_in_batch == 1

    # batch 2: 300 completes, 400 opens — STATE carries across batches
    _write(f"{listing}/b2.json", "t1", ["300.clean", "400.commit.requested"])
    got2 = _run(spark, listing, ckpt, out_dir, "s2")
    r2 = got2["t1"]
    assert r2.completed_in_batch == 1  # 300 closed using carried state
    assert r2.open_commits == 1  # 400 open
    assert r2.first_incomplete == "399"
