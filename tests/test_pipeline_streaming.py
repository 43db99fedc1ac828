"""Streaming ingestion pipeline tests: exact dedup with bounded state
and windowed token telemetry."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from lakeview_spark.streaming import (
    document_stream,
    stream_document_dedup,
    stream_token_stats,
)


def _write_docs(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_document_dedup_drops_in_horizon_duplicates(spark, tmp_path):
    indir = str(tmp_path / "docs")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"doc_id": 1, "text": "alpha beta", "lang": "en", "ingest_ts": "2026-03-01T10:00:00.000Z"},
            {"doc_id": 2, "text": "alpha beta", "lang": "en", "ingest_ts": "2026-03-01T10:00:05.000Z"},
            {"doc_id": 3, "text": "gamma delta", "lang": "de", "ingest_ts": "2026-03-01T10:00:10.000Z"},
            {"doc_id": 4, "text": "gamma delta", "lang": "de", "ingest_ts": "2026-03-01T10:30:00.000Z"},
        ],
    )
    deduped = stream_document_dedup(document_stream(spark, indir), "1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    # one survivor per distinct text within the watermark horizon
    assert sorted(r.text for r in rows) == ["alpha beta", "gamma delta"]


def test_stream_token_stats_windows(spark, tmp_path):
    indir = str(tmp_path / "docs2")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"doc_id": 1, "text": "a b c", "lang": "en", "ingest_ts": "2026-03-01T10:01:00.000Z"},
            {"doc_id": 2, "text": "d e", "lang": "en", "ingest_ts": "2026-03-01T10:04:00.000Z"},
            {"doc_id": 3, "text": "f", "lang": "de", "ingest_ts": "2026-03-01T10:02:00.000Z"},
            {"doc_id": 4, "text": "g h", "lang": "en", "ingest_ts": "2026-03-01T10:15:00.000Z"},
        ],
    )
    stats = stream_token_stats(document_stream(spark, indir), "10 minutes", "5 minutes")
    q = (
        stats.writeStream.format("memory")
        .queryName("tok_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.lang, str(r.window_start)): (r.docs, r.tokens)
        for r in spark.sql("SELECT * FROM tok_stats").collect()
    }
    assert got[("en", "2026-03-01 10:00:00")] == (2, 5)
    assert got[("de", "2026-03-01 10:00:00")] == (1, 1)
    assert got[("en", "2026-03-01 10:10:00")] == (1, 2)


def test_stream_event_sessions_native_session_window(spark, tmp_path):
    """session_window groups events per user by idle gap; sessions close
    once the watermark passes and the output matches a hand-derived
    session structure (two sessions for user 1 split by a >30 min gap,
    one for user 2)."""
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from lakeview_spark.streaming import stream_event_sessions

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    indir = str(tmp_path / "events")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"user_id": 1, "ts": "2026-03-01T10:00:00.000Z"},
            {"user_id": 1, "ts": "2026-03-01T10:10:00.000Z"},
            # > 30 min gap -> new session for user 1
            {"user_id": 1, "ts": "2026-03-01T11:00:00.000Z"},
            {"user_id": 2, "ts": "2026-03-01T10:05:00.000Z"},
            # watermark pusher: late enough that all sessions above close
            {"user_id": 99, "ts": "2026-03-01T15:00:00.000Z"},
        ],
    )
    stream = spark.readStream.schema(schema).json(indir)
    q = (
        stream_event_sessions(stream, gap="30 minutes", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("event_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM event_sessions ORDER BY user_id, session_start").collect()
    closed = [(r.user_id, r.events, r.span_us) for r in rows]
    # user 99's session is still open (nothing after it advances the
    # watermark), so exactly the three closed sessions appear
    assert closed == [
        (1, 2, (10 * 60 + 30 * 60) * 1_000_000),  # 10:00-10:10 + 30min gap pad
        (1, 1, 30 * 60 * 1_000_000),
        (2, 1, 30 * 60 * 1_000_000),
    ]


def test_stream_event_sessions_exact_gap_boundary_merges(spark, tmp_path):
    """Pin the session-gap == boundary (r9 ADVICE): an event arriving
    EXACTLY gap after its predecessor MERGES into the same Spark
    session (verified empirically here — session_window extends the
    window to [ts, ts+gap), and a successor landing on the half-open
    end still merges). The oracle's break rule `gap > 30min` (merge on
    <=) in stream_event_sessions / stream_session_daily_rollup matches
    this inclusive semantic; flipping it to >= would diverge on
    exact-gap data."""
    from pyspark.sql.types import LongType, StructField, StructType, TimestampType

    from lakeview_spark.streaming import stream_event_sessions

    schema = StructType(
        [StructField("user_id", LongType()), StructField("ts", TimestampType())]
    )
    indir = str(tmp_path / "events")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"user_id": 1, "ts": "2026-03-01T10:00:00.000Z"},
            # EXACTLY 30 min after the predecessor — the boundary
            {"user_id": 1, "ts": "2026-03-01T10:30:00.000Z"},
            # one microsecond past the gap -> genuinely new session
            {"user_id": 2, "ts": "2026-03-01T10:00:00.000Z"},
            {"user_id": 2, "ts": "2026-03-01T10:30:00.000001Z"},
            # watermark pusher so everything above closes
            {"user_id": 99, "ts": "2026-03-01T15:00:00.000Z"},
        ],
    )
    stream = spark.readStream.schema(schema).json(indir)
    q = (
        stream_event_sessions(stream, gap="30 minutes", watermark_delay="10 minutes")
        .writeStream.format("memory")
        .queryName("exact_gap_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM exact_gap_sessions ORDER BY user_id, session_start"
    ).collect()
    closed = [(r.user_id, r.events, r.span_us) for r in rows]
    assert closed == [
        # exact-gap pair MERGES: one session, 10:00 -> 10:30 + 30min pad
        (1, 2, 60 * 60 * 1_000_000),
        # 1 us past the gap SPLITS: two singleton sessions
        (2, 1, 30 * 60 * 1_000_000),
        (2, 1, 30 * 60 * 1_000_000),
    ]


def test_stream_embedding_neardup_matches_planted_duplicate(spark, tmp_path):
    """A streamed copy of an indexed vector must surface as a near-dup
    (cosine 1.0 with itself) through the stream-static bucket join; a
    vector orthogonal-ish to the index must not produce spurious 1.0s."""
    import json as _json

    from lakeview_spark.pipeline.similarity import _lsh_bucketed, _plane_vectors
    from lakeview_spark.streaming.pipeline_stream import stream_embedding_neardup

    sf = "/root/testdata/sf0.001"
    indexed = _lsh_bucketed(spark, sf)
    planes = _plane_vectors(spark, sf)
    dup_src = indexed.filter(F.col("vec_id") == 10).collect()[0]

    indir = str(tmp_path / "vecs")
    _write_docs(
        f"{indir}/batch1.json",
        [{"vec_id": 100010, "embedding": [float(x) for x in dup_src.embedding]}],
    )
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    stream = spark.readStream.schema(schema).json(indir)
    q = (
        stream_embedding_neardup(stream, indexed, planes, threshold=0.99)
        .writeStream.format("memory")
        .queryName("neardup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM neardup_stream").collect()
    hits = {(r.delta_vec, r.index_vec) for r in rows}
    assert (100010, 10) in hits, "planted duplicate must collide in its bucket and score ~1"
    for r in rows:
        assert r.cosine >= 0.99


def test_stream_quality_filter_matches_batch_flags(spark, tmp_path):
    """The streaming filter must keep exactly the documents the batch
    funnel's first three stages keep (near-dup stage is batch-only)."""
    from lakeview_spark.streaming.pipeline_stream import stream_quality_filter

    indir = str(tmp_path / "docs")
    _write_docs(
        f"{indir}/batch1.json",
        [
            # passes all three stages: 49 distinct tokens incl. a stopword
            {"doc_id": 1, "text": "the " + " ".join(f"w{i}" for i in range(48)), "lang": "en", "ingest_ts": "2026-03-01T10:00:00.000Z"},
            # too short
            {"doc_id": 2, "text": "the tiny one", "lang": "en", "ingest_ts": "2026-03-01T10:00:01.000Z"},
            # long enough but no english stopword
            {"doc_id": 3, "text": "alpha beta gamma delta " * 12, "lang": "de", "ingest_ts": "2026-03-01T10:00:02.000Z"},
            # stopword present but only 2 distinct tokens in 60 (fails 1/3 ratio)
            {"doc_id": 4, "text": "the " + "spam " * 59, "lang": "en", "ingest_ts": "2026-03-01T10:00:03.000Z"},
        ],
    )
    q = (
        stream_quality_filter(document_stream(spark, indir))
        .writeStream.format("memory")
        .queryName("quality_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.sql("SELECT * FROM quality_stream").collect()}
    assert kept == {1}


def test_stream_anomaly_zscore_matches_batch_scan(spark):
    """The streaming monitor over the events file-stream must flag
    EXACTLY the rows the batch events_anomaly_zscore scan flags when
    the moment table comes from the same data."""
    from lakeview_spark.plans import QUERIES
    from lakeview_spark.plans.registry import t
    from lakeview_spark.plans.tpch_extra import event_value_moments
    from lakeview_spark.streaming import stream_anomaly_zscore

    sf_dir = "/root/testdata/sf0.001"
    batch_events = t(spark, sf_dir, "events")
    moments = event_value_moments(
        batch_events.select("event_id", "event_type", "value")
    )
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_id", "event_type", "value")
    )
    q = (
        stream_anomaly_zscore(stream, moments)
        .writeStream.format("memory")
        .queryName("anomaly_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.zscore)
        for r in spark.sql("SELECT * FROM anomaly_stream").collect()
    }
    want = {
        (r.event_id, r.zscore)
        for r in QUERIES["events_anomaly_zscore"](spark, sf_dir).collect()
    }
    assert got == want and got


def test_stream_boilerplate_filter_matches_batch_screen(spark, tmp_path):
    """foreachBatch screening must keep exactly the docs the batch
    text_boilerplate_lines pass would keep at the same ratio bound,
    with the line set published from the same corpus."""
    from lakeview_spark.plans import QUERIES
    from lakeview_spark.streaming import stream_boilerplate_filter

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from lakeview_spark.pipeline.curation import published_boilerplate_lines

    bp = published_boilerplate_lines(spark, sf_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    got_batches = []

    def sink(batch_df, batch_id):
        got_batches.extend(batch_df.collect())

    q = (
        stream_boilerplate_filter(stream, bp, sink, max_ratio=0.5)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    ratios = {
        r.doc_id: r.boilerplate_ratio
        for r in QUERIES["text_boilerplate_lines"](spark, sf_dir).collect()
    }
    want = {d for d, ratio in ratios.items() if ratio <= 0.5}
    got = {r.doc_id for r in got_batches}
    assert got == want and got
    for r in got_batches:
        assert abs(r.boilerplate_ratio - ratios[r.doc_id]) < 1e-12


def test_stream_dedup_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Stop/restart against the same checkpointLocation must not
    reprocess batch-1 files: the restarted query picks up only the new
    file, and the parquet sink holds each surviving doc exactly once."""
    from lakeview_spark.streaming import document_stream, stream_document_dedup

    indir = str(tmp_path / "docs")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"doc_id": 1, "text": "alpha beta", "lang": "en", "ingest_ts": "2026-03-01T10:00:00.000Z"},
            {"doc_id": 2, "text": "alpha beta", "lang": "en", "ingest_ts": "2026-03-01T10:00:05.000Z"},
        ],
    )

    def run_once():
        q = (
            stream_document_dedup(document_stream(spark, indir), "1 hour")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = {r.doc_id for r in spark.read.parquet(outdir).collect()}
    assert first == {1}  # doc 2 is an in-horizon duplicate

    # second run: one genuinely new doc plus a late duplicate of doc 1
    _write_docs(
        f"{indir}/batch2.json",
        [
            {"doc_id": 3, "text": "gamma delta", "lang": "de", "ingest_ts": "2026-03-01T10:10:00.000Z"},
            {"doc_id": 4, "text": "alpha beta", "lang": "en", "ingest_ts": "2026-03-01T10:15:00.000Z"},
        ],
    )
    run_once()
    rows = spark.read.parquet(outdir).collect()
    ids = sorted(r.doc_id for r in rows)
    # exactly-once: batch-1 rows not re-emitted, duplicate state survived
    # the restart (doc 4 dropped because doc 1 is in checkpointed state)
    assert ids == [1, 3], ids


def test_stream_quantile_sketch_matches_pure_python_replay(spark):
    """stream_quantile_sketch (the live histogram run to completion +
    p50 readout) == a pure-Python replay of the pinned-grid sketch over
    the raw events at sf0.001, and the p50 estimate brackets the exact
    per-(window, type) median within one bin width."""
    import pyarrow.parquet as pq

    from lakeview_spark.plans import QUERIES
    from lakeview_spark.plans.streaming_twins import (
        _SVH_BINS,
        _SVH_WIDTH,
        _SVH_WIN_US,
    )

    sf_dir = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf_dir}/events.parquet").to_pydict()

    def to_us(ts):
        # physical type has shipped as both nanos-int and timestamp
        if isinstance(ts, int):
            return ts // 1000
        import calendar

        return (
            calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond
        )

    groups: dict[tuple, list[float]] = {}
    for ts, et, v in zip(tbl["ts"], tbl["event_type"], tbl["value"]):
        win = to_us(ts) // _SVH_WIN_US * _SVH_WIN_US
        groups.setdefault((win, et), []).append(v)
    expected = {}
    for key, vs in groups.items():
        bins = [0] * _SVH_BINS
        for v in vs:
            bins[min(_SVH_BINS - 1, int(v // _SVH_WIDTH))] += 1
        cum = 0
        for b, c in enumerate(bins):
            cum += c
            if cum * 2 >= len(vs):
                expected[key] = (len(vs), b, b * _SVH_WIDTH)
                break
        vs.sort()
        exact_median = vs[(len(vs) - 1) // 2]
        assert expected[key][2] <= exact_median <= expected[key][2] + _SVH_WIDTH

    rows = QUERIES["stream_quantile_sketch"](spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (r.n_events, r.p50_bin, r.p50_est) == expected[
            (r.window_start_us, r.event_type)
        ]


def test_stream_bloom_prune_bins_match_batch_audit(spark):
    """The streaming Bloom prune's (window, lang) bins, summed per
    lang, equal the batch dedup_bloom_prune audit's per-lang verdicts
    (same filter, same md5 bit math — the stream just bins them live),
    and the no-false-negative law carries over: per lang,
    n_maybe_seen >= the batch audit's n_actually_seen."""
    from lakeview_spark.plans import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        r.lang: r for r in QUERIES["dedup_bloom_prune"](spark, sf_dir).collect()
    }
    by_lang: dict[str, list[int]] = {}
    for r in QUERIES["stream_bloom_prune"](spark, sf_dir).collect():
        agg = by_lang.setdefault(r.lang, [0, 0, 0])
        agg[0] += r.n_incoming
        agg[1] += r.n_maybe_seen
        agg[2] += r.n_definitely_new
        assert r.n_definitely_new == r.n_incoming - r.n_maybe_seen
    assert set(by_lang) == set(batch)
    for lang, (inc, maybe, new) in by_lang.items():
        b = batch[lang]
        assert (inc, maybe, new) == (
            b.n_incoming,
            b.n_maybe_seen,
            b.n_definitely_new,
        )
        assert maybe >= b.n_actually_seen  # Bloom law, binned live


def test_stream_interval_join_matches_across_micro_batches(spark, tmp_path):
    """Stream-STREAM interval join: a view arriving in micro-batch 1
    must match a click arriving in micro-batch 2 — the pair can only
    come from buffered join STATE, which is what separates a
    stream-stream join from the stream-static joins elsewhere in this
    layer. Also pins the inner-join emission set: exactly the pairs
    with 0 <= click_ts - view_ts <= max_gap and the same user."""
    import time

    from lakeview_spark.streaming.pipeline_stream import stream_interval_join

    indir = str(tmp_path / "events")
    os.makedirs(indir)
    b1 = f"{indir}/batch1.json"
    b2 = f"{indir}/batch2.json"
    with open(b1, "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 1, "ts": "2026-03-01T10:00:00.000Z", "event_type": "view"}) + "\n")
        f.write(json.dumps({"event_id": 2, "user_id": 1, "ts": "2026-03-01T10:05:00.000Z", "event_type": "click"}) + "\n")
        f.write(json.dumps({"event_id": 3, "user_id": 2, "ts": "2026-03-01T10:10:00.000Z", "event_type": "click"}) + "\n")
    with open(b2, "w") as f:
        f.write(json.dumps({"event_id": 4, "user_id": 1, "ts": "2026-03-01T11:00:00.000Z", "event_type": "click"}) + "\n")
        f.write(json.dumps({"event_id": 5, "user_id": 3, "ts": "2026-03-01T12:00:00.000Z", "event_type": "view"}) + "\n")
    # file source orders micro-batches by modification time — force it
    now = time.time()
    os.utime(b1, (now - 60, now - 60))
    os.utime(b2, (now, now))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    views = stream.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_interval_join(views, clicks, "6 hours", "1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("interval_join_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    pairs = {
        (r.view_id, r.click_id)
        for r in spark.table("interval_join_sink").collect()
    }
    # view 1 matches click 2 (same batch) AND click 4 (NEXT batch, via
    # join state); click 3 is another user, view 5 has no click after it
    assert pairs == {(1, 2), (1, 4)}


def test_stream_interval_join_outer_emission_rule(spark, tmp_path):
    """Pins the watermark-timed outer-emission semantics the
    stream_interval_join_outer oracle encodes: an unmatched view emits
    a NULL-click row iff view_ts + max_gap < final watermark STRICTLY
    (the == tie stays in state and never emits; an unmatched view whose
    window is still open never emits; matches emit normally, including
    the click_ts == view_ts boundary)."""
    from lakeview_spark.streaming.pipeline_stream import stream_interval_join

    indir = str(tmp_path / "events")
    os.makedirs(indir)
    rows = [
        # window [00:00, 06:00] closes before watermark 11:00 -> NULL row
        {"event_id": 1, "user_id": 1, "ts": "2026-03-01T00:00:00.000Z", "event_type": "view"},
        # window end 11:00 == watermark -> tie, NOT emitted
        {"event_id": 2, "user_id": 2, "ts": "2026-03-02T05:00:00.000Z", "event_type": "view"},
        # window end 12:00 > watermark -> still open, NOT emitted
        {"event_id": 3, "user_id": 3, "ts": "2026-03-02T06:00:00.000Z", "event_type": "view"},
        # matched normally
        {"event_id": 4, "user_id": 4, "ts": "2026-03-01T01:00:00.000Z", "event_type": "view"},
        {"event_id": 5, "user_id": 4, "ts": "2026-03-01T02:00:00.000Z", "event_type": "click"},
        # watermark drivers on both sides (max ts 12:00, delay 1h -> 11:00),
        # matched at the click_ts == view_ts boundary (gap 0)
        {"event_id": 6, "user_id": 9, "ts": "2026-03-02T12:00:00.000Z", "event_type": "click"},
        {"event_id": 7, "user_id": 9, "ts": "2026-03-02T12:00:00.000Z", "event_type": "view"},
    ]
    with open(f"{indir}/b.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, event_type string"
    ).json(indir)
    views = stream.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("view_user"),
        F.col("ts").alias("view_ts"),
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    j = stream_interval_join(views, clicks, "6 hours", "1 hour", how="leftOuter")
    q = (
        j.writeStream.format("memory")
        .queryName("outer_rule_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (r.view_id, r.click_id)
        for r in spark.table("outer_rule_sink").collect()
    }
    assert got == {(1, None), (4, 5), (7, 6)}


def test_stream_session_rollup_chains_and_buckets_by_session_end(spark, tmp_path):
    """Chained stateful streaming (session_window -> daily window) on a
    crafted stream: pins that (a) the chain emits through BOTH stateful
    operators under AvailableNow, and (b) window(win, bucket) assigns a
    session by its END — the midnight-crossing session here must land
    in day 2, not day 1 (start-bucketing would put it in day 1)."""
    from lakeview_spark.streaming.pipeline_stream import stream_session_rollup

    indir = str(tmp_path / "events")
    os.makedirs(indir)
    rows = [
        # user 1: one session fully inside day 1 (2 events)
        {"event_id": 1, "user_id": 1, "ts": "2026-03-01T10:00:00.000Z"},
        {"event_id": 2, "user_id": 1, "ts": "2026-03-01T10:10:00.000Z"},
        # user 2: session CROSSING midnight — starts day 1, last event
        # 00:10 day 2, end = 00:40 day 2 -> must count in day 2
        {"event_id": 3, "user_id": 2, "ts": "2026-03-01T23:50:00.000Z"},
        {"event_id": 4, "user_id": 2, "ts": "2026-03-02T00:10:00.000Z"},
        # watermark driver: advances watermark past day 2 (max - 1h),
        # its own session stays open/unflushed in day 3
        {"event_id": 5, "user_id": 9, "ts": "2026-03-03T12:00:00.000Z"},
    ]
    with open(f"{indir}/b.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp"
    ).json(indir)
    daily = stream_session_rollup(
        stream.select("user_id", "ts"),
        gap="30 minutes",
        watermark_delay="1 hour",
        bucket="1 day",
    )
    q = (
        daily.writeStream.format("memory")
        .queryName("chain_rule_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        str(r.w.start)[:10]: (r.sessions, r.tot_events)
        for r in spark.table("chain_rule_sink").collect()
    }
    # day 1: only user 1's session; day 2: the midnight-crosser; the
    # watermark driver's open session never flushes
    assert got == {"2026-03-01": (1, 2), "2026-03-02": (1, 2)}


@pytest.mark.slow
def test_stream_interval_join_equals_batch_join_property(spark, tmp_path):
    """Property check of the inner twin's oracle claim on randomized
    single-batch streams: the emitted pair set equals the batch
    interval join for arbitrary event layouts (dense, sparse, ties,
    multi-user). Randomness comes from hypothesis; each example writes
    a fresh stream directory."""
    from hypothesis import given, settings, strategies as st

    from lakeview_spark.streaming.pipeline_stream import stream_interval_join

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        evs=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=3),     # user
                st.integers(min_value=0, max_value=48),    # hour offset
                st.booleans(),                             # view?
            ),
            min_size=1,
            max_size=12,
        )
    )
    def check(evs):
        counter[0] += 1
        indir = str(tmp_path / f"evs{counter[0]}")
        os.makedirs(indir)
        rows = []
        for i, (u, h, is_view) in enumerate(evs):
            rows.append(
                {
                    "event_id": i,
                    "user_id": u,
                    "ts": f"2026-03-{1 + h // 24:02d}T{h % 24:02d}:00:00.000Z",
                    "event_type": "view" if is_view else "click",
                }
            )
        with open(f"{indir}/b.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        ).json(indir)
        views = stream.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.col("ts").alias("view_ts"),
        )
        clicks = stream.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        j = stream_interval_join(views, clicks, "6 hours", "1 hour")
        q = (
            j.writeStream.format("memory")
            .queryName(f"prop_sink{counter[0]}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        got = {
            (r.view_id, r.click_id)
            for r in spark.table(f"prop_sink{counter[0]}").collect()
        }
        want = {
            (i, j2)
            for i, (u1, h1, v1) in enumerate(evs)
            if v1
            for j2, (u2, h2, v2) in enumerate(evs)
            if not v2 and u1 == u2 and 0 <= h2 - h1 <= 6
        }
        assert got == want, (got, want)

    check()


def test_stream_curation_funnel_composes_all_three_screens(spark, tmp_path):
    """stream_curation_funnel: a quality-failing doc never emits, a
    statically-contaminated doc never emits, a probe-mod doc never
    emits, and an exact duplicate arriving in a LATER micro-batch is
    dropped from state (the composition across batches — what separates
    the funnel from three batch filters)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from lakeview_spark.streaming import stream_curation_funnel

    good = " ".join(["the"] + [f"tok{i}" for i in range(49)])  # 50 toks, stopword, distinct
    short = "the tiny one"  # fails the 40-token floor
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
            StructField("ingest_ts", TimestampType()),
        ]
    )
    indir = str(tmp_path / "docs")
    _write_docs(
        f"{indir}/batch1.json",
        [
            {"doc_id": 1, "lang": "en", "text": good, "ingest_ts": "2026-03-01T10:00:00.000Z"},
            {"doc_id": 2, "lang": "en", "text": short, "ingest_ts": "2026-03-01T10:00:01.000Z"},
            {"doc_id": 3, "lang": "en", "text": good + " variant", "ingest_ts": "2026-03-01T10:00:02.000Z"},
            {"doc_id": 29, "lang": "en", "text": good + " probe", "ingest_ts": "2026-03-01T10:00:03.000Z"},
        ],
    )
    _write_docs(
        f"{indir}/batch2.json",
        [
            # exact duplicate of doc 1's text, later batch -> state drop
            {"doc_id": 4, "lang": "en", "text": good, "ingest_ts": "2026-03-01T10:10:00.000Z"},
            # same text, different lang -> kept (key is (lang, hash))
            {"doc_id": 5, "lang": "de", "text": good, "ingest_ts": "2026-03-01T10:10:01.000Z"},
        ],
    )
    contaminated = spark.createDataFrame([(3,)], "doc_id long")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).json(indir)
    q = (
        stream_curation_funnel(stream, contaminated, probe_mod=29)
        .writeStream.format("memory")
        .queryName("curation_funnel")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT doc_id, lang FROM curation_funnel ORDER BY doc_id"
    ).collect()
    kept = [(r.doc_id, r.lang) for r in rows]
    # doc 2 (quality), doc 3 (contaminated), doc 29 (probe), doc 4
    # (cross-batch duplicate) all screened; 1 and 5 survive
    assert kept == [(1, "en"), (5, "de")]


def test_stream_paragraph_gate_matches_batch_apply(spark):
    """Every live verdict equals the batch rule: the gate's kept flag
    per scored paragraph is exactly (s <= t2) under the batch
    thresholds, the scored-paragraph set matches text_paragraph_ppl,
    and folding verdicts per doc reproduces text_paragraph_apply's
    kept counts for the scored paragraphs (unscored ones are kept
    trivially by the batch apply)."""
    from lakeview_spark.plans import QUERIES
    from lakeview_spark.pipeline.text import _para_thresholds

    sf_dir = "/root/testdata/sf0.001"
    live = QUERIES["stream_paragraph_gate"](spark, sf_dir).collect()
    t2 = _para_thresholds(spark, sf_dir).collect()[0].t2
    batch_ppl = {
        (r.doc_id, r.para_idx): r
        for r in QUERIES["text_paragraph_ppl"](spark, sf_dir).collect()
    }
    assert {(r.doc_id, r.para_idx) for r in live} == set(batch_ppl)
    for r in live:
        b = batch_ppl[(r.doc_id, r.para_idx)]
        assert (r.n_bigrams, r.total_qbits, r.s) == (b.n_bigrams, b.total_qbits, b.s)
        assert r.kept == (r.s <= t2)
        # the batch bucket rule: kept <=> not tail
        assert r.kept == (b.bucket != "tail")
    # fold per doc: kept-scored + unscored == the batch apply's kept
    kept_scored = {}
    scored = {}
    for r in live:
        kept_scored[r.doc_id] = kept_scored.get(r.doc_id, 0) + int(r.kept)
        scored[r.doc_id] = scored.get(r.doc_id, 0) + 1
    for a in QUERIES["text_paragraph_apply"](spark, sf_dir).collect():
        unscored = a.n_paras - scored.get(a.doc_id, 0)
        assert a.kept_paras == kept_scored.get(a.doc_id, 0) + unscored, a.doc_id
