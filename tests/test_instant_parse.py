"""Parser parity with ActiveTimelineInstantBatcher.getActiveTimeLineInstant
(reference ActiveTimelineInstantBatcher.java:267-297); cases from the
reference test corpus (FIXTURES.md §1)."""

from __future__ import annotations

import pytest

from lakeview_spark.functions.instants import parse_instants, whitelist_filter
from lakeview_spark.operators.batcher import parse_instant

CASES = [
    # filename, ts, completion, action, state
    ("111.deltacommit.requested", "111", None, "deltacommit", "requested"),
    ("111.deltacommit.inflight", "111", None, "deltacommit", "inflight"),
    ("111.deltacommit", "111", None, "deltacommit", "completed"),
    ("111.inflight", "111", None, "commit", "inflight"),  # commit-action inflight
    ("111.commit.requested", "111", None, "commit", "requested"),
    ("222.compaction.requested", "222", None, "compaction", "requested"),
    ("222.commit", "222", None, "commit", "completed"),
    ("444.savepoint.inflight", "444", None, "savepoint", "inflight"),
    ("444.savepoint", "444", None, "savepoint", "completed"),
    ("222.rollback", "222", None, "rollback", "completed"),
    (
        "20260204053206256_20260204053210895.deltacommit",
        "20260204053206256",
        "20260204053210895",
        "deltacommit",
        "completed",
    ),
    ("222.unknown", "222", None, "unknown", "completed"),
]


@pytest.mark.parametrize("filename,ts,completion,action,state", CASES)
def test_python_parser(filename, ts, completion, action, state):
    inst = parse_instant(filename)
    assert (inst.ts, inst.completion_ts, inst.action, inst.state) == (
        ts,
        completion,
        action,
        state,
    )


def test_columnar_parser_matches_python(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["filename"])
    rows = {r.filename: r for r in parse_instants(df).collect()}
    for filename, ts, completion, action, state in CASES:
        r = rows[filename]
        assert r.ts_str == ts
        assert r.completion_ts == completion
        assert r.action == action
        assert r.state == state
        assert str(r.ts) == ts  # decimal cast survives 17-digit ids


def test_whitelist_filter(spark):
    names = [
        "111.deltacommit",
        "222.unknown",
        "222.unknown.inflight",
        "hoodie.properties",
        "333.clean.requested",
    ]
    df = spark.createDataFrame([(n,) for n in names], ["filename"])
    kept = {r.filename for r in whitelist_filter(df).collect()}
    assert kept == {"111.deltacommit", "hoodie.properties", "333.clean.requested"}
