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
