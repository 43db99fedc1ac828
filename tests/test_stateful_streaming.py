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


def test_cusum_state_carries_across_micro_batches(spark, tmp_path):
    """Two micro-batches (one json file each, maxFilesPerTrigger=1) must
    end in the same chart state as a single-pass Python CUSUM over the
    concatenated, time-ordered stream — proving state survives the
    batch boundary and replay order is deterministic."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from lakeview_spark.streaming import stream_value_cusum
    from lakeview_spark.streaming.stateful import CUSUM_H, CUSUM_K

    indir = str(tmp_path / "events")
    _os.makedirs(indir, exist_ok=True)
    moments = {"click": (10.0, 2.0)}
    # batch 1 drifts upward (should build s_pos), batch 2 keeps drifting
    # past the decision interval
    b1 = [
        {"event_id": i, "ts_us": 1000 + i, "event_type": "click", "value": 13.0}
        for i in range(5)
    ]
    b2 = [
        {"event_id": 10 + i, "ts_us": 2000 + i, "event_type": "click", "value": 14.0}
        for i in range(6)
    ]
    with open(f"{indir}/b1.json", "w") as f:
        for r in b1:
            f.write(_json.dumps(r) + "\n")
    with open(f"{indir}/b2.json", "w") as f:
        for r in b2:
            f.write(_json.dumps(r) + "\n")

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    q = (
        stream_value_cusum(stream, moments)
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM cusum_stream ORDER BY n_seen"
    ).collect()
    assert len(rows) == 2, rows  # one row per micro-batch

    # single-pass python reference over the ordered concatenation
    s_pos = s_neg = 0.0
    alerts = []
    a = 0
    for i, r in enumerate(sorted(b1 + b2, key=lambda r: (r["ts_us"], r["event_id"]))):
        z = (r["value"] - 10.0) / 2.0
        s_pos = max(0.0, s_pos + z - CUSUM_K)
        s_neg = max(0.0, s_neg - z - CUSUM_K)
        if s_pos > CUSUM_H:
            a += 1
            s_pos = 0.0
        if s_neg > CUSUM_H:
            a += 1
            s_neg = 0.0
        if i == len(b1) - 1:
            alerts.append(a)
            a = 0
    alerts.append(a)

    final = rows[-1]
    assert final.n_seen == len(b1) + len(b2)
    assert abs(final.s_pos - s_pos) < 1e-12
    assert abs(final.s_neg - s_neg) < 1e-12
    assert [r.alerts_in_batch for r in rows] == alerts
    assert sum(alerts) >= 1, "the drift scenario must raise at least one alarm"


def test_cusum_twin_matches_python_replay(spark):
    """The registry twin (plans/streaming_twins.py stream_value_cusum)
    must equal a plain-Python replay of the chart over the same rows in
    the same (ts, event_id) order — the oracle-independent ground truth
    for the AvailableNow single-batch run."""
    from lakeview_spark.plans import QUERIES
    from lakeview_spark.plans.registry import events_ts_us, t
    from lakeview_spark.plans.streaming_twins import (
        _CUSUM_MEAN,
        _CUSUM_SD,
        _CUSUM_TYPES,
    )
    from lakeview_spark.streaming.stateful import CUSUM_H, CUSUM_K

    sf = "/root/testdata/sf0.001"
    got = {
        r.event_type: r
        for r in QUERIES["stream_value_cusum"](spark, sf).collect()
    }
    ev = t(spark, sf, "events")
    rows = (
        ev.filter(ev.event_type.isin(*_CUSUM_TYPES))
        .select("event_type", events_ts_us(ev).alias("ts_us"), "event_id", "value")
        .collect()
    )
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.ts_us, r.event_id)):
        by_type.setdefault(r.event_type, []).append(float(r.value))
    assert set(got) == set(by_type)
    for typ, values in by_type.items():
        s_pos = s_neg = 0.0
        alerts = 0
        for v in values:
            z = (v - _CUSUM_MEAN) / _CUSUM_SD
            s_pos = max(0.0, s_pos + z - CUSUM_K)
            s_neg = max(0.0, s_neg - z - CUSUM_K)
            if s_pos > CUSUM_H:
                alerts += 1
                s_pos = 0.0
            if s_neg > CUSUM_H:
                alerts += 1
                s_neg = 0.0
        r = got[typ]
        assert (r.s_pos, r.s_neg, r.n_seen, r.alerts_in_batch) == (
            s_pos,
            s_neg,
            len(values),
            alerts,
        ), typ


def test_sequence_pack_state_spans_micro_batch_boundary(spark, tmp_path):
    """A sequence whose docs arrive across TWO micro-batches must flush
    with stats identical to the batch closed form (cum_before div/mod
    budget) over the concatenated doc_id-ordered stream — the VERDICT
    r10 next-4 'sequence spanning the batch boundary packs identically
    to batch' pin. Budget 10 keeps the walk hand-checkable."""
    import json as _json
    import os as _os

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from lakeview_spark.streaming.stateful import stream_sequence_pack

    indir = str(tmp_path / "docs")
    _os.makedirs(indir, exist_ok=True)
    b1 = [
        {"doc_id": 1, "lang": "en", "n_tokens": 4},
        {"doc_id": 2, "lang": "en", "n_tokens": 4},
    ]
    b2 = [
        {"doc_id": 3, "lang": "en", "n_tokens": 5},   # spans seq 0 -> 1
        {"doc_id": 4, "lang": "en", "n_tokens": 3},   # flushes seq 0
        {"doc_id": 5, "lang": "en", "n_tokens": 12},  # spans seq 1 -> 2
        {"doc_id": 6, "lang": "en", "n_tokens": 2},   # flushes seq 1
    ]
    with open(f"{indir}/b1.json", "w") as f:
        for r in b1:
            f.write(_json.dumps(r) + "\n")
    with open(f"{indir}/b2.json", "w") as f:
        for r in b2:
            f.write(_json.dumps(r) + "\n")

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("n_tokens", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    budget = 10
    q = (
        stream_sequence_pack(stream, budget)
        .writeStream.format("memory")
        .queryName("seq_pack_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(1 for p in q.recentProgress if p.numInputRows > 0) == 2
    got = {
        (r.lang, r.seq_id): (r.docs_starting, r.tokens_starting, r.first_offset)
        for r in spark.table("seq_pack_stream").collect()
    }

    # batch closed form over the concatenated doc_id-ordered stream
    cum = 0
    ref = {}
    max_seq = 0
    for r in sorted(b1 + b2, key=lambda r: r["doc_id"]):
        seq, off = cum // budget, cum % budget
        d, tk, first = ref.get(("en", seq), (0, 0, off))
        ref[("en", seq)] = (d + 1, tk + r["n_tokens"], first)
        cum += r["n_tokens"]
        max_seq = max(max_seq, seq)
    expected = {k: v for k, v in ref.items() if k[1] < max_seq}

    assert got == expected
    # the open tail (seq 2) must NOT have emitted
    assert ("en", max_seq) not in got
    # and the boundary-spanning sequence 0 carries batch-1 docs
    assert got[("en", 0)] == (3, 13, 0)


def test_source_caps_state_survives_the_batch_boundary(spark, tmp_path):
    """Two micro-batches (one json file each, maxFilesPerTrigger=1):
    the per-source admitted count carries across the boundary, so the
    TOTAL admitted per source never exceeds the cap even though each
    batch is sorted and admitted independently — and within each batch
    admission follows the batch operator's (bin, hkey, doc_id) order."""
    import hashlib
    import json as _json
    import os as _os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from lakeview_spark.streaming.stateful import stream_source_caps

    indir = str(tmp_path / "docs")
    _os.makedirs(indir, exist_ok=True)
    b1 = [{"doc_id": i, "lang": "en", "source": "s0"} for i in range(8)]
    b2 = [{"doc_id": 100 + i, "lang": "en", "source": "s0"} for i in range(8)]
    for name, rows in (("b1.json", b1), ("b2.json", b2)):
        with open(f"{indir}/{name}", "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    cap = 5
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(indir)
    )
    out = stream_source_caps(stream, cap)
    q = (
        out.writeStream.format("memory")
        .queryName("src_caps_two_batches")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.doc_id for r in spark.table("src_caps_two_batches").collect()}
    assert len(got) == cap

    def hkey(d):
        return int(hashlib.md5(f"scap:{d}".encode()).hexdigest()[:15], 16)

    order = lambda d: (hkey(d) % 256, hkey(d), d)  # noqa: E731
    first = sorted((r["doc_id"] for r in b1), key=order)
    # file order decides which batch replays first; the admitted set is
    # cap-greedy over batch 1's order then (if room remained) batch 2's
    if len(first) >= cap:
        assert got == set(first[:cap])
