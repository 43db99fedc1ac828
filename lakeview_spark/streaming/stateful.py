"""Custom stateful streaming operator (SURVEY §2.9 / north-star item
'applyInPandasWithState for custom stateful operators').

`track_incomplete_commits` maintains, per table, the set of commit
timestamps that have been seen but not yet completed — the streaming
twin of the reference's firstIncompleteCommitFile bookkeeping
(TimelineCommitInstantsUploader.java:958-980). Each micro-batch updates
the per-table state with newly arrived instant files and emits the
current first-incomplete timestamp (min open commit - 1, CONTINUE-mode
arithmetic, ActiveTimelineInstantBatcher.java:186-190).

State layout (GroupState): two parallel lists (open commit ts, seen
states bitmask) — bounded by the number of in-flight commits per table,
which is O(1..100) in practice; a watermark-based timeout would evict
abandoned commits in production.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from lakeview_spark.operators.batcher import parse_instant

_REQUESTED, _INFLIGHT, _COMPLETED = 1, 2, 4
_STATE_BITS = {"requested": _REQUESTED, "inflight": _INFLIGHT, "completed": _COMPLETED}

STATE_SCHEMA = StructType(
    [
        StructField("open_ts", ArrayType(StringType())),
        StructField("seen_bits", ArrayType(IntegerType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("table_id", StringType()),
        StructField("open_commits", LongType()),
        StructField("first_incomplete", StringType()),
        StructField("completed_in_batch", LongType()),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    table_id = key[0]
    if state.exists:
        open_ts, seen_bits = state.get
        seen = dict(zip(open_ts, seen_bits))
    else:
        seen = {}

    completed_now = 0
    for pdf in pdfs:
        for fn in pdf["filename"]:
            inst = parse_instant(fn)
            if inst.action not in {
                "commit", "deltacommit", "clean", "compaction",
                "replacecommit", "clustering", "logcompaction",
                "rollback", "savepoint", "restore",
            }:
                continue
            bits = seen.get(inst.ts, 0) | _STATE_BITS.get(inst.state, 0)
            seen[inst.ts] = bits

    still_open = {}
    for ts, bits in seen.items():
        if bits & _COMPLETED:
            completed_now += 1
        else:
            still_open[ts] = bits
    state.update((list(still_open.keys()), list(still_open.values())))

    first_incomplete = ""
    if still_open:
        first_incomplete = str(min(int(ts) for ts in still_open) - 1)
    yield pd.DataFrame(
        [(table_id, len(still_open), first_incomplete, completed_now)],
        columns=["table_id", "open_commits", "first_incomplete", "completed_in_batch"],
    )


def track_incomplete_commits(stream: DataFrame) -> DataFrame:
    """files stream (table_id, filename, ...) -> per-table incomplete-
    commit tracker, one output row per table per micro-batch."""
    return (
        stream.select("table_id", "filename")
        .groupBy("table_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# CUSUM drift detector over the event stream (second custom stateful
# operator): per event_type, the classic two-sided cumulative-sum
# control chart on standardized values. State = (s_pos, s_neg) carried
# across micro-batches; an alarm fires when either side crosses the
# decision interval H, then that side resets — change-point detection
# a pipeline runs on its telemetry to catch distribution drift that a
# per-batch z-score scan cannot see (many small shifts, no single
# outlier).

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("n_seen", LongType()),
        StructField("alerts_in_batch", LongType()),
    ]
)

# reference slack and decision interval in sigma units (textbook values)
CUSUM_K = 0.5
CUSUM_H = 5.0


def cusum_detector(
    moments: dict[str, tuple[float, float]],
    k: float = CUSUM_K,
    h: float = CUSUM_H,
):
    """Build the per-group update function with the batch-published
    per-type (mean, std) closed over — the same two-tier design as
    stream_anomaly_zscore: the reference distribution is tiny (one row
    per event type) and refreshed batch-side."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        event_type = key[0]
        s_pos, s_neg, n_seen = state.get if state.exists else (0.0, 0.0, 0)
        mean, sd = moments.get(event_type, (0.0, 1.0))
        alerts = 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic replay order: event time, then id as tiebreak
        batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
        for value in batch["value"]:
            z = (float(value) - mean) / sd
            s_pos = max(0.0, s_pos + z - k)
            s_neg = max(0.0, s_neg - z - k)
            if s_pos > h:
                alerts += 1
                s_pos = 0.0
            if s_neg > h:
                alerts += 1
                s_neg = 0.0
            n_seen += 1
        state.update((s_pos, s_neg, n_seen))
        yield pd.DataFrame(
            [(event_type, s_pos, s_neg, n_seen, alerts)],
            columns=["event_type", "s_pos", "s_neg", "n_seen", "alerts_in_batch"],
        )

    return update


def stream_value_cusum(
    stream: DataFrame,
    moments: dict[str, tuple[float, float]],
    k: float = CUSUM_K,
    h: float = CUSUM_H,
) -> DataFrame:
    """events stream (event_id, ts_us, event_type, value) -> per-type
    CUSUM tracker, one row per type per micro-batch with the end-of-
    batch chart state and the alarms raised. State is two doubles and a
    counter per event type — constant, never row-proportional."""
    return (
        stream.select("event_id", "ts_us", "event_type", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            cusum_detector(moments, k, h),
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming sequence packer (third custom stateful operator): pack
# arriving documents into fixed-budget training sequences with per-lang
# carry state across micro-batches, emitting COMPLETED sequences only —
# the streaming twin of pipeline/packing.py's concat-and-chunk layout
# (pack_training_sequences / pack_sequence_stats), the one batch op a
# LIVE training-data pipeline genuinely needs streamed (VERDICT r10
# next-4). State per lang = the running token cursor plus the OPEN
# (partially filled) sequence's stats; a sequence flushes exactly when
# a later document's first token lands past its boundary, so every
# emitted row is final (append-once) and the open tail never emits.

PACK_STATE_SCHEMA = StructType(
    [
        StructField("cum", LongType()),          # tokens seen so far
        StructField("open_seq", LongType()),     # -1 = no open sequence
        StructField("open_docs", LongType()),
        StructField("open_tokens", LongType()),
        StructField("open_first", LongType()),
    ]
)

PACK_OUTPUT_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("seq_id", LongType()),
        StructField("docs_starting", LongType()),
        StructField("tokens_starting", LongType()),
        StructField("first_offset", LongType()),
    ]
)


def sequence_packer(budget: int):
    """Build the per-lang update function. Replay order inside a batch
    is doc_id (mergesort — the CUSUM determinism device); across
    batches the carry state makes a boundary-spanning sequence pack
    identically to the batch closed form (pinned by
    tests/test_stateful_streaming.py's two-micro-batch case)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lang = key[0]
        cum, open_seq, open_docs, open_tokens, open_first = (
            state.get if state.exists else (0, -1, 0, 0, 0)
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("doc_id", kind="mergesort")
        flushed = []
        for n_tokens in batch["n_tokens"]:
            n = int(n_tokens)
            seq = cum // budget
            off = cum % budget
            if seq != open_seq:
                if open_seq >= 0:
                    # the cursor crossed the open sequence's boundary:
                    # it is complete and its stats are final
                    flushed.append(
                        (lang, open_seq, open_docs, open_tokens, open_first)
                    )
                open_seq, open_docs, open_tokens, open_first = seq, 1, n, off
            else:
                open_docs += 1
                open_tokens += n
            cum += n
        state.update((cum, open_seq, open_docs, open_tokens, open_first))
        yield pd.DataFrame(
            flushed,
            columns=[
                "lang", "seq_id", "docs_starting", "tokens_starting",
                "first_offset",
            ],
        )

    return update


def stream_sequence_pack(stream: DataFrame, budget: int) -> DataFrame:
    """documents stream (doc_id, lang, n_tokens) -> completed training
    sequences, one row per (lang, sequence) with the same stats as the
    batch `pack_sequence_stats` (docs starting, their token mass, the
    first start offset). State per lang is FIVE integers — constant,
    never row- or sequence-proportional — so a year-long stream carries
    the same state as a minute-long one."""
    return (
        stream.select("doc_id", "lang", "n_tokens")
        .groupBy("lang")
        .applyInPandasWithState(
            sequence_packer(budget),
            outputStructType=PACK_OUTPUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Per-source admission caps at ingestion (r12): the streaming twin of
# pipeline/mixing.py mix_source_caps — admit at most `cap` documents
# per source, chosen by the SAME deterministic total order the batch
# op selects by ((hash bin, hash key, doc_id) — md5, no RNG), with the
# cap BATCH-PUBLISHED (one corpus count — the stream_classifier_gate
# published-parameter pattern, so live and batch caps cannot disagree).
# State per source is ONE integer (admitted so far), independent of
# stream age; under a single AvailableNow batch the admitted set is
# byte-identical to the batch operator's (shared oracle), and across
# batches the carry makes admission greedy in arrival order within the
# same total order per batch (the documented streaming semantics).

SRC_CAP_STATE_SCHEMA = StructType([StructField("admitted", LongType())])

SRC_CAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def source_cap_admitter(cap: int, bins: int = 256):
    """Build the per-source update function: sort the batch by the
    batch op's (bin, hkey, doc_id) total order, admit up to the
    remaining per-source budget, carry the admitted count."""
    import hashlib

    def _hkey(doc_id: int) -> int:
        return int(
            hashlib.md5(f"scap:{int(doc_id)}".encode()).hexdigest()[:15], 16
        )

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (admitted,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        hk = batch["doc_id"].map(_hkey)
        batch = batch.assign(_hk=hk, _bin=hk % bins)
        batch = batch.sort_values(["_bin", "_hk", "doc_id"], kind="mergesort")
        room = max(0, int(cap) - int(admitted))
        keep = batch.head(room)
        state.update((int(admitted) + len(keep),))
        yield keep[["doc_id", "lang", "source"]]

    return update


def stream_source_caps(stream: DataFrame, cap: int, bins: int = 256) -> DataFrame:
    """documents stream (doc_id, lang, source) -> the admitted rows
    under the per-source document cap (section comment above)."""
    return (
        stream.select("doc_id", "lang", "source")
        .groupBy("source")
        .applyInPandasWithState(
            source_cap_admitter(cap, bins),
            outputStructType=SRC_CAP_OUTPUT_SCHEMA,
            stateStructType=SRC_CAP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
