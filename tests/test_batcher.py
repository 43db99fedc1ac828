"""Batcher parity tests — table-driven, modeled on the reference's
ActiveTimelineInstantBatcherTest corpus (SURVEY §5, FIXTURES.md §§1,3).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from lakeview_spark.operators.batcher import (
    BLOCK,
    CONTINUE,
    batch_instants,
    create_batches,
)


def run(names, max_batch=20, strategy=BLOCK, ckpt_ts=None, lm=None, first_inc=""):
    files = [(n, (lm or {}).get(n)) for n in names]
    return create_batches(files, max_batch, strategy, ckpt_ts, first_inc)


def test_simple_complete_triples():
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "222.deltacommit.requested",
        "222.deltacommit.inflight",
        "222.deltacommit",
    ]
    _, batches = run(names)
    assert batches == [
        [
            "111.deltacommit",
            "111.deltacommit.inflight",
            "111.deltacommit.requested",
            "222.deltacommit",
            "222.deltacommit.inflight",
            "222.deltacommit.requested",
        ]
    ]


def test_hoodie_properties_first_in_first_batch():
    names = [
        "111.commit.requested",
        "111.inflight",
        "111.commit",
        "hoodie.properties",
    ]
    _, batches = run(names)
    assert batches[0][0] == "hoodie.properties"
    assert batches == [
        ["hoodie.properties", "111.commit", "111.commit.requested", "111.inflight"]
    ]


def test_commit_inflight_without_action_token():
    # 111.inflight sorts after 111.commit and 111.commit.requested;
    # triple is related because ts equal + all three states present
    names = ["111.commit.requested", "111.inflight", "111.commit"]
    _, batches = run(names)
    assert batches == [["111.commit", "111.commit.requested", "111.inflight"]]


def test_compaction_completed_as_commit():
    # 222.commit completes 222.compaction.* (actions differ inside the
    # triple; only ts + state-set matter — reference test :136-166)
    names = ["222.compaction.requested", "222.compaction.inflight", "222.commit"]
    _, batches = run(names)
    assert batches == [
        ["222.commit", "222.compaction.inflight", "222.compaction.requested"]
    ]


def test_savepoint_two_file_group():
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "444.savepoint.inflight",
        "444.savepoint",
    ]
    _, batches = run(names)
    assert batches == [
        [
            "111.deltacommit",
            "111.deltacommit.inflight",
            "111.deltacommit.requested",
            "444.savepoint",
            "444.savepoint.inflight",
        ]
    ]


def test_rollback_two_file_group():
    names = [
        "1111.rollback.inflight",
        "1111.rollback",
        "2222.deltacommit.requested",
        "2222.deltacommit.inflight",
        "2222.deltacommit",
    ]
    _, batches = run(names)
    assert batches == [
        [
            "1111.rollback",
            "1111.rollback.inflight",
            "2222.deltacommit",
            "2222.deltacommit.inflight",
            "2222.deltacommit.requested",
        ]
    ]


def test_rollback_full_triple():
    names = [
        "555.rollback.requested",
        "555.rollback.inflight",
        "555.rollback",
        "666.commit.requested",
        "666.inflight",
        "666.commit",
    ]
    _, batches = run(names)
    assert batches == [
        [
            "555.rollback",
            "555.rollback.inflight",
            "555.rollback.requested",
            "666.commit",
            "666.commit.requested",
            "666.inflight",
        ]
    ]


def test_lone_completed_rollback_mid_timeline():
    # reference test :398-429 — single completed rollback passes as group of 1
    names = [
        "222.rollback",
        "333.deltacommit.requested",
        "333.deltacommit.inflight",
        "333.deltacommit",
    ]
    _, batches = run(names)
    assert batches == [
        [
            "222.rollback",
            "333.deltacommit",
            "333.deltacommit.inflight",
            "333.deltacommit.requested",
        ]
    ]


def test_lone_completed_rollback_at_end_deferred():
    # at the tail (index+2 >= n) a lone rollback stops iteration and is
    # NOT uploaded this round (reference :87-93)
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "999.rollback",
    ]
    _, batches = run(names)
    assert batches == [
        ["111.deltacommit", "111.deltacommit.inflight", "111.deltacommit.requested"]
    ]


def test_incomplete_commit_blocks():
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "333.clean.requested",
        "333.clean.inflight",
        "444.deltacommit.requested",
        "444.deltacommit.inflight",
        "444.deltacommit",
    ]
    first_inc, batches = run(names, strategy=BLOCK)
    assert first_inc == ""
    assert batches == [
        ["111.deltacommit", "111.deltacommit.inflight", "111.deltacommit.requested"]
    ]


def test_incomplete_commit_continue_skips_and_tracks_checkpoint():
    names = [
        "111.clean.requested",
        "111.clean.inflight",
        "222.deltacommit.requested",
        "222.deltacommit.inflight",
        "222.deltacommit",
    ]
    first_inc, batches = run(names, strategy=CONTINUE)
    # min incomplete ts is 111 -> checkpoint 110 (reference test :632-698)
    assert first_inc == "110"
    assert batches == [
        ["222.deltacommit", "222.deltacommit.inflight", "222.deltacommit.requested"]
    ]


def test_continue_mode_recency_prefilter():
    t0 = datetime(2026, 1, 1)
    t1 = datetime(2026, 2, 1)
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "222.deltacommit.requested",
        "222.deltacommit.inflight",
        "222.deltacommit",
    ]
    lm = {n: (t0 if n.startswith("111") else t1) for n in names}
    # checkpoint at t0: group 111 has no member strictly newer -> dropped
    _, batches = run(names, strategy=CONTINUE, ckpt_ts=t0, lm=lm)
    assert batches == [
        ["222.deltacommit", "222.deltacommit.inflight", "222.deltacommit.requested"]
    ]


def test_unknown_actions_filtered():
    names = [
        "222.unknown",
        "222.unknown.inflight",
        "222.unknown.requested",
        "333.commit.requested",
        "333.inflight",
        "333.commit",
    ]
    _, batches = run(names)
    assert batches == [["333.commit", "333.commit.requested", "333.inflight"]]


def test_v9_completion_time_filenames():
    names = [
        "20260204053206256.deltacommit.requested",
        "20260204053206256.deltacommit.inflight",
        "20260204053206256_20260204053210895.deltacommit",
    ]
    _, batches = run(names)
    # completed V9 file sorts after .inflight/.requested? '_' (0x5f) > '.' (0x2e)
    assert batches == [
        [
            "20260204053206256.deltacommit.inflight",
            "20260204053206256.deltacommit.requested",
            "20260204053206256_20260204053210895.deltacommit",
        ]
    ]


def test_batch_overflow_keeps_groups_atomic():
    names = []
    for ts in range(100, 103):  # 3 triples = 9 files, max 4 -> one triple per batch
        names += [f"{ts}.commit.requested", f"{ts}.inflight", f"{ts}.commit"]
    _, batches = run(names, max_batch=4)
    assert [len(b) for b in batches] == [3, 3, 3]
    assert batches[0] == ["100.commit", "100.commit.requested", "100.inflight"]


def test_invalid_batch_size():
    with pytest.raises(ValueError):
        run(["111.commit"], max_batch=2)


def test_trailing_incomplete_commit_not_emitted():
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "555.deltacommit.requested",
        "555.deltacommit.inflight",
    ]
    _, batches = run(names)
    assert batches == [
        ["111.deltacommit", "111.deltacommit.inflight", "111.deltacommit.requested"]
    ]


def test_spark_operator_matches_python(spark):
    names = [
        "hoodie.properties",
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "111.deltacommit",
        "1111.rollback.inflight",
        "1111.rollback",
        "222.compaction.requested",
        "222.compaction.inflight",
        "222.commit",
        "333.clean.requested",
        "333.clean.inflight",
    ]
    t = datetime(2026, 3, 1)
    rows = [("tblA", n, t) for n in names] + [("tblB", n, t) for n in names]
    df = spark.createDataFrame(rows, ["table_id", "filename", "last_modified"])
    out = batch_instants(df, max_batch_size=20, strategy=BLOCK).collect()

    expected_first, expected_batches = create_batches(
        [(n, t) for n in names], 20, BLOCK
    )
    for tbl in ("tblA", "tblB"):
        got = sorted(
            [r for r in out if r.table_id == tbl],
            key=lambda r: (r.batch_id, r.seq_in_batch),
        )
        flat = [
            (r.batch_id - 1, r.seq_in_batch, r.filename) for r in got
        ]
        exp = [
            (bi, si, fn)
            for bi, batch in enumerate(expected_batches)
            for si, fn in enumerate(batch)
        ]
        assert flat == exp
        assert all(r.first_incomplete == expected_first for r in got)


# The reference's full non-blocking parameterized corpus
# (ActiveTimelineInstantBatcherTest.java:618-698): multiple incompletes,
# unknown actions, stale skipped incompletes, and the firstIncompleteCommit
# arithmetic (min incomplete ts - 1) across them.

_CKPT_TS = datetime(2024, 7, 22)  # getCheckpoint(): 22-07-2024 UTC midnight
_OLD = datetime(2024, 7, 21)  # "21-07-2024" entries: before the checkpoint
_NEW = datetime(2024, 7, 23)  # generateFileObj default mtime


def test_nonblocking_trailing_incomplete_only_properties():
    # case 1 (:635-642): a single trailing incomplete commit is dropped
    # without setting first_incomplete (iteration just stops there)
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "hoodie.properties",
    ]
    lm = {n: _NEW for n in names}
    first_inc, batches = run(
        names, max_batch=4, strategy=CONTINUE, ckpt_ts=_CKPT_TS, lm=lm
    )
    assert batches == [["hoodie.properties"]]
    assert first_inc == ""


def test_nonblocking_mid_incomplete_sets_checkpoint_and_continues():
    # case 2 (:643-666): 111 incomplete mid-timeline, 222 unknown action,
    # 444 trailing incomplete — iteration is NOT blocked, and the next
    # run resumes from (first missed incomplete) - 1 = 110
    names = [
        "111.deltacommit.requested",
        "111.deltacommit.inflight",
        "333.clean",
        "444.rollback.requested",
        "333.clean.requested",
        "222.unknown.inflight",
        "333.clean.inflight",
        "222.unknown.requested",
        "444.rollback.inflight",
        "222.unknown",
        "hoodie.properties",
    ]
    lm = {n: _NEW for n in names}
    first_inc, batches = run(
        names, max_batch=4, strategy=CONTINUE, ckpt_ts=_CKPT_TS, lm=lm
    )
    assert batches == [
        ["hoodie.properties", "333.clean", "333.clean.inflight", "333.clean.requested"]
    ]
    assert first_inc == "110"


def test_nonblocking_multiple_incompletes_min_minus_one():
    # case 3 (:667-697): three live incompletes (444, 666 trailing) plus a
    # stale skipped incomplete (222, older than the checkpoint ts — not
    # re-emitted); batches flow past the incompletes and the checkpoint
    # lands at min(incomplete) - 1 = 443
    names_lm = [
        ("111.deltacommit.requested", _NEW),
        ("111.deltacommit.inflight", _NEW),
        ("111.deltacommit", _NEW),
        ("333.clean", _NEW),
        ("444.rollback.requested", _NEW),
        ("333.clean.requested", _NEW),
        ("222.clean.inflight", _OLD),
        ("333.clean.inflight", _NEW),
        ("222.clean.requested", _OLD),
        ("444.rollback.inflight", _NEW),
        ("666.rollback.requested", _NEW),
        ("777.rollback.requested", _NEW),
        ("777.rollback.inflight", _NEW),
        ("777.rollback", _NEW),
    ]
    names = [n for n, _ in names_lm]
    lm = dict(names_lm)
    first_inc, batches = run(
        names,
        max_batch=4,
        strategy=CONTINUE,
        ckpt_ts=_CKPT_TS,
        lm=lm,
        first_inc="500",
    )
    assert batches == [
        ["111.deltacommit", "111.deltacommit.inflight", "111.deltacommit.requested"],
        ["333.clean", "333.clean.inflight", "333.clean.requested"],
        ["777.rollback", "777.rollback.inflight", "777.rollback.requested"],
    ]
    assert first_inc == "443"
