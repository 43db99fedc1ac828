"""Commit-group batching (SURVEY §2 A1/A2/W1).

Semantics mirror the reference's ActiveTimelineInstantBatcher
(ActiveTimelineInstantBatcher.java:44-184):

- instants are sorted lexicographically by filename with
  hoodie.properties forced first (:226-237)
- the walk is *positional* over the sorted list, not a group-by: a
  completed `222.commit` can complete `222.compaction.{inflight,requested}`
  because relatedness only checks equal timestamps + the state set
  (:239-252) — actions may differ within a triple
- rollback groups may be 3, 2 or 1 file (:83-112); savepoint groups are 2
  (:113-123); everything else is a triple (:124-136)
- greedy packing: if the group would overflow maxBatchSize, flush and
  start a new batch — groups are never split (:138-147)
- BLOCK_ON_INCOMPLETE_COMMIT stops at the first incomplete group;
  CONTINUE_ON_INCOMPLETE_COMMIT skips one file at a time and tracks
  min(incomplete_ts) - 1 as the resume point (:148-165,186-190)
- CONTINUE mode also pre-filters to commit groups where any member is
  newer than the checkpoint timestamp (:199-218)

Greedy packing with variable atomic group sizes is inherently sequential
*per table*, so the Spark operator runs the pure-Python packer inside
``applyInPandas`` grouped by table_id: parallel across tables (the unit
that scales to millions), sequential within a table (the unit that is
small — active timelines are O(100) files).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeview_spark.constants import (
    EPOCH,
    HOODIE_PROPERTIES_FILE,
    ROLLBACK_ACTION,
    SAVEPOINT_ACTION,
    VALID_SAVEPOINT_ROLLBACK_ACTIONS,
    WHITELISTED_ACTION_TYPES,
)
from lakeview_spark.schemas import BATCHES_SCHEMA

BLOCK = "BLOCK_ON_INCOMPLETE_COMMIT"
CONTINUE = "CONTINUE_ON_INCOMPLETE_COMMIT"


@dataclass(frozen=True)
class Instant:
    ts: str
    completion_ts: str | None
    action: str
    state: str


def parse_instant(filename: str) -> Instant:
    """Python twin of functions.instants (ActiveTimelineInstantBatcher.java:267-297)."""
    parts = filename.split(".", 2)
    tok0 = parts[0]
    if "_" in tok0:
        ts, completion = tok0.split("_", 1)
    else:
        ts, completion = tok0, None
    if len(parts) == 2 and parts[1] == "inflight":
        action, state = "commit", "inflight"
    else:
        action = parts[1] if len(parts) > 1 else ""
        state = parts[2] if len(parts) == 3 else "completed"
    return Instant(ts, completion, action, state)


def _are_related(i1: Instant, i2: Instant, i3: Instant) -> bool:
    """Triple relatedness (:239-252): same ts, states cover all three."""
    if i1.ts != i2.ts or i2.ts != i3.ts:
        return False
    return {"inflight", "requested", "completed"} <= {i1.state, i2.state, i3.state}


def _are_related_sp_rb(i1: Instant, i2: Instant) -> bool:
    """Savepoint/rollback 2-file relatedness (:255-265)."""
    if i1.ts != i2.ts:
        return False
    return (
        {"inflight", "completed"} <= {i1.state, i2.state}
        and i1.action == i2.action
        and i1.action in VALID_SAVEPOINT_ROLLBACK_ACTIONS
    )


def _keep(filename: str) -> bool:
    """Whitelist filter (:220-224)."""
    if filename == HOODIE_PROPERTIES_FILE:
        return True
    return parse_instant(filename).action in WHITELISTED_ACTION_TYPES


def _sort_key(filename: str) -> tuple:
    # hoodie.properties first, then lexicographic (:226-237)
    return (filename != HOODIE_PROPERTIES_FILE, filename)


def _commit_group_key(filename: str) -> str:
    # grouping key for the CONTINUE-mode recency filter (:202-205)
    raw = filename.split(".", 2)[0]
    return raw.split("_")[0] if "_" in raw else raw


def recency_filter(kept: Sequence[tuple], checkpoint_ts) -> list[tuple]:
    """CONTINUE-mode group recency filter
    (ActiveTimelineInstantBatcher.java:199-218): group whitelisted files
    by commit key, keep every group containing hoodie.properties or any
    member strictly newer than the checkpoint; unknown mtimes (None)
    count as new. Group survival is all-or-nothing — a stale sibling
    rides along with its fresh group."""
    groups: dict[str, list[tuple]] = {}
    for fn, lm in kept:
        groups.setdefault(_commit_group_key(fn), []).append((fn, lm))
    return [
        pair
        for grp in groups.values()
        if any(
            fn == HOODIE_PROPERTIES_FILE or lm is None or lm > checkpoint_ts
            for fn, lm in grp
        )
        for pair in grp
    ]


def create_batches(
    files: Sequence[tuple],
    max_batch_size: int,
    strategy: str = BLOCK,
    checkpoint_ts=None,
    first_incomplete: str = "",
) -> tuple[str, list[list[str]]]:
    """Pure-Python batcher core.

    ``files``: iterable of (filename, last_modified) — last_modified may be
    None outside CONTINUE mode. Returns (first_incomplete_checkpoint,
    batches) exactly like the reference's createBatches (:44-184).
    """
    if max_batch_size < 3:
        raise ValueError("max batch size cannot be less than 3")
    checkpoint_ts = checkpoint_ts or EPOCH

    kept = [(fn, lm) for fn, lm in files if _keep(fn)]
    if strategy == CONTINUE:
        kept = recency_filter(kept, checkpoint_ts)
    sorted_names = sorted((fn for fn, _ in kept), key=_sort_key)

    batches: list[list[str]] = []
    current: list[str] = []
    first_incomplete_ckpt = first_incomplete or ""

    start = 0
    if sorted_names and sorted_names[0] == HOODIE_PROPERTIES_FILE:
        start = 1
        current.append(sorted_names[0])

    n = len(sorted_names)
    index = start
    # stop threshold n-2 so a trailing completed savepoint pair is still seen
    while index <= n - 2:
        i1 = parse_instant(sorted_names[index])
        group_size = 3
        related = False
        stop = False

        if i1.action == ROLLBACK_ACTION:
            if index + 2 >= n:
                related, stop = False, True
            else:
                i2 = parse_instant(sorted_names[index + 1])
                i3 = parse_instant(sorted_names[index + 2])
                related = _are_related(i1, i2, i3)
                if not related:
                    related = _are_related_sp_rb(i1, i2)
                    group_size = 2
                    if not related and i1.state == "completed":
                        group_size = 1
                        related = True
        elif i1.action == SAVEPOINT_ACTION:
            if index + 1 >= n:
                related, stop = False, True
            else:
                i2 = parse_instant(sorted_names[index + 1])
                related = _are_related_sp_rb(i1, i2)
                group_size = 2
        else:
            if index + 2 >= n:
                related, stop = False, True
            else:
                i2 = parse_instant(sorted_names[index + 1])
                i3 = parse_instant(sorted_names[index + 2])
                related = _are_related(i1, i2, i3)

        if related:
            if len(current) + group_size <= max_batch_size:
                current.extend(sorted_names[index : index + group_size])
            else:
                batches.append(list(current))
                current = list(sorted_names[index : index + group_size])
        elif not stop:
            if strategy == CONTINUE:
                candidate = str(int(i1.ts) - 1)
                if not first_incomplete_ckpt or candidate < first_incomplete_ckpt:
                    first_incomplete_ckpt = candidate
                group_size = 1
            else:
                stop = True

        if stop:
            if current:
                batches.append(list(current))
                current = []
            break

        index += group_size

    if current:
        batches.append(current)
    return first_incomplete_ckpt, batches


def batch_instants(
    files_df: DataFrame,
    max_batch_size: int = 20,
    strategy: str = BLOCK,
    checkpoints_df: DataFrame | None = None,
) -> DataFrame:
    """Spark operator: files(table_id, filename, last_modified) -> batches.

    Runs the packer per table via applyInPandas — one task per table,
    shuffle keyed on table_id only (the per-table file list is tiny; the
    table count is what scales). Joining the checkpoint dimension is a
    broadcast join.
    """
    cols = ["table_id", "filename", "last_modified"]
    df = files_df.select(*cols)
    if checkpoints_df is not None:
        ckpt = checkpoints_df.select(
            "table_id",
            F.col("checkpoint_ts").alias("_ckpt_ts"),
            F.col("first_incomplete_commit_file").alias("_first_incomplete"),
            F.col("batch_id").alias("_ckpt_batch_id"),
        )
        df = df.join(F.broadcast(ckpt), "table_id", "left")
    else:
        df = (
            df.withColumn("_ckpt_ts", F.lit(None).cast("timestamp"))
            .withColumn("_first_incomplete", F.lit(None).cast("string"))
            .withColumn("_ckpt_batch_id", F.lit(None).cast("int"))
        )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        table_id = pdf["table_id"].iloc[0]
        ckpt_ts = pdf["_ckpt_ts"].iloc[0]
        ckpt_ts = None if pd.isna(ckpt_ts) else ckpt_ts.to_pydatetime()
        first_inc = pdf["_first_incomplete"].iloc[0]
        first_inc = "" if (first_inc is None or pd.isna(first_inc)) else str(first_inc)
        base_batch = pdf["_ckpt_batch_id"].iloc[0]
        base_batch = 0 if pd.isna(base_batch) else int(base_batch)

        lm = pdf["last_modified"]
        pairs = [
            (fn, None if pd.isna(t) else t.to_pydatetime())
            for fn, t in zip(pdf["filename"], lm)
        ]
        first_incomplete, batches = create_batches(
            pairs, max_batch_size, strategy, ckpt_ts, first_inc
        )
        rows = [
            (table_id, base_batch + bi + 1, si, fn, first_incomplete)
            for bi, batch in enumerate(batches)
            for si, fn in enumerate(batch)
        ]
        return pd.DataFrame(
            rows, columns=["table_id", "batch_id", "seq_in_batch", "filename", "first_incomplete"]
        )

    return df.groupBy("table_id").applyInPandas(pack, schema=BATCHES_SCHEMA)
