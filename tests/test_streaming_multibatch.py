"""Streaming correctness beyond one micro-batch (VERDICT r04 §next-5).

Every registry streaming twin is deterministic partly because each
testdata table is a single parquet file -> ONE micro-batch. These tests
split the same data into N time-ordered files, force one file per
trigger (maxFilesPerTrigger=1), and assert the stateful operators —
session windows, dedup-within-watermark, windowed aggregation — produce
the SAME results across real watermark advances as the single-batch
twins. The stateless ops (quality filter, stream-static near-dup join)
are row-local, so multi-batch equivalence is structural for them; the
stateful three are where cross-batch state can break.
"""

from __future__ import annotations

import itertools
import json
import os

from pyspark.sql import functions as F

from lakeview_spark.plans.registry import events_ts_us, t
from lakeview_spark.streaming.pipeline_stream import (
    DOCS_STREAM_SCHEMA,
    stream_document_dedup,
    stream_event_sessions,
    stream_token_stats,
)

import pytest

# slow tier (deselected by the default "-m not slow" addopts; the
# builder's close battery runs the full suite with -m "slow or not
# slow"): end-to-end / property-simulation coverage that exceeds the
# round driver's pytest budget — correctness gating lives in
# test_oracle_parity + the hygiene/golden suites, which stay fast
pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"
_SINK = itertools.count()


def _run_stream(result, output_mode):
    """AvailableNow to completion into a unique memory sink; returns
    (sink DataFrame, query) so tests can count micro-batches."""
    name = f"multibatch_sink_{next(_SINK)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return result.sparkSession.table(name), q


def _data_batches(q) -> int:
    return sum(1 for p in q.recentProgress if p["numInputRows"] > 0)


def _write_time_ordered_files(spark, df, order_col, n_files, dest) -> None:
    """Split `df` into n_files parquet files in ascending `order_col`
    order, with file mtimes forcing the file source to pick them up
    oldest-range first — time-ordered arrival, so the watermark only
    ever advances and no row is late."""
    os.makedirs(dest, exist_ok=True)
    pdf = df.toPandas().sort_values(order_col, kind="mergesort").reset_index(drop=True)
    per = -(-len(pdf) // n_files)
    base = 1_000_000_000
    for i in range(n_files):
        chunk = pdf.iloc[i * per : (i + 1) * per]
        path = os.path.join(dest, f"batch_{i:03d}.parquet")
        spark.createDataFrame(chunk, schema=df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path + ".dir")
        part = [
            f
            for f in os.listdir(path + ".dir")
            if f.startswith("part-") and f.endswith(".parquet")
        ][0]
        os.replace(os.path.join(path + ".dir", part), path)
        os.utime(path, (base + i, base + i))


def test_session_windows_match_single_batch_across_micro_batches(spark, tmp_path):
    """session_window state must carry across micro-batches: sessions
    spanning a file boundary merge, closed sessions emit once, and the
    final emitted set equals the single-batch run (whose emission rule
    — end <= final watermark — is oracle-verified in the registry)."""
    events = t(spark, SF_DIR, "events")
    e = events.select(
        "user_id", F.timestamp_micros(events_ts_us(events)).alias("ts")
    )
    stream_dir = str(tmp_path / "events_stream")
    _write_time_ordered_files(spark, e, "ts", 4, stream_dir)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    sess = stream_event_sessions(stream, gap="30 minutes", watermark_delay="1 hour")
    multi, q = _run_stream(sess, "append")
    assert _data_batches(q) >= 3, [p["numInputRows"] for p in q.recentProgress]

    single = stream_event_sessions(
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1000)
        .parquet(stream_dir),
        gap="30 minutes",
        watermark_delay="1 hour",
    )
    expected, _ = _run_stream(single, "append")

    key = lambda r: (r.user_id, r.session_start, r.span_us, r.events)  # noqa: E731
    got = sorted(map(key, multi.collect()))
    want = sorted(map(key, expected.collect()))
    assert got == want and len(got) > 0
    # no session emitted twice despite incremental emission
    assert len(got) == len(set(got))


def _write_json_batch(path, rows, mtime) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def test_dedup_within_watermark_across_micro_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark across real watermark advances:
    duplicates within the delay are dropped even across micro-batches;
    a duplicate arriving after the key's state was evicted re-emits —
    exactly the documented two-tier contract (the batch dedup_exact
    pass catches beyond-horizon repeats)."""
    stream_dir = str(tmp_path / "docs_stream")
    os.makedirs(stream_dir)
    doc = lambda i, text, ts: {  # noqa: E731
        "doc_id": i,
        "text": text,
        "lang": "en",
        "ingest_ts": ts,
    }
    # batch 0: A, B arrive
    _write_json_batch(
        os.path.join(stream_dir, "b0.json"),
        [
            doc(1, "alpha text", "2026-03-01T10:00:00.000Z"),
            doc(2, "beta text", "2026-03-01T10:05:00.000Z"),
        ],
        1_000_000_000,
    )
    # batch 1: duplicate of A well inside the 1 h horizon -> dropped;
    # C advances the watermark to 11:30 - 1 h = 10:30
    _write_json_batch(
        os.path.join(stream_dir, "b1.json"),
        [
            doc(3, "alpha text", "2026-03-01T10:20:00.000Z"),
            doc(4, "gamma text", "2026-03-01T11:30:00.000Z"),
        ],
        1_000_000_001,
    )
    # batch 2: D advances the watermark to 12:40 - 1 h = 11:40, past
    # the batch-0 keys' expiry (first-seen + 1 h = 11:05/11:20); the
    # store removes them at the END of the batch that RUNS with that
    # watermark (verified empirically: numRowsRemoved=2 one batch after
    # the advance), so another advancing batch follows before the probe
    _write_json_batch(
        os.path.join(stream_dir, "b2.json"),
        [doc(5, "delta text", "2026-03-01T12:40:00.000Z")],
        1_000_000_002,
    )
    # batch 3: runs with watermark 11:40 -> evicts A and B state
    _write_json_batch(
        os.path.join(stream_dir, "b3.json"),
        [doc(8, "epsilon text", "2026-03-01T14:00:00.000Z")],
        1_000_000_003,
    )
    # batch 4: duplicate of B after eviction -> re-emitted (two-tier
    # contract; the batch dedup_exact pass owns beyond-horizon repeats);
    # duplicate of D still inside the horizon (expiry 13:40 > watermark
    # 13:00) -> dropped
    _write_json_batch(
        os.path.join(stream_dir, "b4.json"),
        [
            doc(6, "beta text", "2026-03-01T14:10:00.000Z"),
            doc(7, "delta text", "2026-03-01T14:15:00.000Z"),
        ],
        1_000_000_004,
    )

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )
    out, q = _run_stream(stream_document_dedup(stream, "1 hour"), "append")
    assert _data_batches(q) >= 5
    survivors = sorted(r.doc_id for r in out.collect())
    # 1=A, 2=B, 4=C, 5=D, 8=E first arrivals; 3 and 7 dropped as
    # in-horizon duplicates (3 across a batch boundary); 6 re-emits
    # post-eviction
    assert survivors == [1, 2, 4, 5, 6, 8]


def test_windowed_token_stats_accumulate_across_micro_batches(spark, tmp_path):
    """Tumbling-window aggregation state must accumulate when one
    window's rows span several micro-batches (update mode re-emits the
    window with the larger counts). The final value per (lang, window)
    must equal the batch GROUP BY."""
    docs = t(spark, SF_DIR, "documents").select(
        "doc_id",
        "text",
        "lang",
        F.timestamp_micros(
            F.lit(1_772_323_200_000_000) + (F.col("doc_id") % 120) * F.lit(60_000_000)
        ).alias("ingest_ts"),
    )
    stream_dir = str(tmp_path / "docs_window_stream")
    _write_time_ordered_files(spark, docs, "ingest_ts", 4, stream_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    stats = stream_token_stats(stream, "10 minutes", "5 minutes")
    sink, q = _run_stream(stats, "update")
    assert _data_batches(q) >= 3
    # update mode re-emits a window per batch that touches it; the last
    # (= max, counts are monotone) emission is the final state
    final = sink.groupBy("lang", "window_start").agg(
        F.max("docs").alias("docs"), F.max("tokens").alias("tokens")
    )
    expected = docs.groupBy(
        "lang", F.window("ingest_ts", "10 minutes")["start"].alias("window_start")
    ).agg(
        F.count("*").alias("docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens"),
    )
    key = lambda r: (r.lang, r.window_start, r.docs, r.tokens)  # noqa: E731
    assert sorted(map(key, final.collect())) == sorted(map(key, expected.collect()))


def test_error_proximity_pairs_across_micro_batches(spark, tmp_path):
    """stream_error_proximity is stateless stream-static, so the pair
    set must be EXACTLY the batch banded join's regardless of how the
    error stream is chopped into micro-batches — verified with the
    errors split across 4 time-ordered files, one per trigger."""
    from lakeview_spark.plans.tpch_extra import _PROX_US
    from lakeview_spark.streaming.pipeline_stream import stream_error_proximity

    batch = t(spark, SF_DIR, "events")
    errors = batch.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        events_ts_us(batch).alias("err_us"),
    )
    dest = str(tmp_path / "errors_split")
    _write_time_ordered_files(spark, errors, "err_us", 4, dest)
    stream = (
        spark.readStream.schema(errors.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dest)
    )
    cand = (
        batch.filter(F.col("event_type").isin("click", "view"))
        .select(
            "user_id",
            events_ts_us(batch).alias("cand_us"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .withColumn("band", F.expr(f"cand_us div {_PROX_US}"))
    )
    pairs = stream_error_proximity(stream, cand, _PROX_US)
    sink, q = _run_stream(pairs, "append")
    assert _data_batches(q) >= 3
    got = {
        (r.err_id, r.cand_us)
        for r in sink.select("err_id", "cand_us").collect()
    }
    exp_pairs = (
        errors.join(cand.drop("band"), "user_id")
        .filter(F.abs(F.col("cand_us") - F.col("err_us")) <= _PROX_US)
        .select("err_id", "cand_us")
        .collect()
    )
    expected = {(r.err_id, r.cand_us) for r in exp_pairs}
    assert got == expected and expected
