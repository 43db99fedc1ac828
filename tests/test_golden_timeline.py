"""Golden-file batcher test (reference test style: timeline filenames in,
expected batch lists out — expectations hand-derived, frozen in
tests/golden/timeline_batches.json)."""

from __future__ import annotations

import json
import os

import pytest

from lakeview_spark.operators.batcher import create_batches

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "timeline_batches.json")

with open(GOLDEN) as f:
    CASES = json.load(f)["cases"]


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_golden_timeline_batches(case):
    first_inc, batches = create_batches(
        [(n, None) for n in case["input"]],
        case["max_batch_size"],
        case["strategy"],
    )
    assert batches == case["expected_batches"], case["name"]
    assert first_inc == case["expected_first_incomplete"], case["name"]
