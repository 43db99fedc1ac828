"""Config override merge (S10 / ConfigRefresher parity) and
ONCE_WITH_RETRY scheduling policy."""

from __future__ import annotations

from lakeview_spark.config import (
    deep_merge,
    load_config_with_override,
    should_run_once_with_retry,
)

BASE = {
    "version": "V1",
    "metadataExtractorConfig": {
        "jobRunMode": "ONCE",
        "uploadStrategy": "BLOCK_ON_INCOMPLETE_COMMIT",
        "pathExclusionPatterns": ["a"],
        "parserConfig": [
            {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
        ],
    },
}


def test_deep_merge_semantics():
    merged = deep_merge(
        {"a": {"b": 1, "c": 2}, "lst": [1, 2]},
        {"a": {"c": 3}, "lst": [9], "new": True},
    )
    assert merged == {"a": {"b": 1, "c": 3}, "lst": [9], "new": True}


def test_load_config_with_override():
    cfg = load_config_with_override(
        BASE,
        {"metadataExtractorConfig": {"uploadStrategy": "CONTINUE_ON_INCOMPLETE_COMMIT"}},
    )
    assert cfg.upload_strategy == "CONTINUE_ON_INCOMPLETE_COMMIT"
    assert cfg.path_exclusion_patterns == ["a"]  # untouched keys survive
    assert load_config_with_override(BASE, None).upload_strategy == "BLOCK_ON_INCOMPLETE_COMMIT"


def test_once_with_retry_policy():
    # failed run, retries remain, cron far away -> retry
    assert should_run_once_with_retry(1, False, 60.0)
    # success -> never retry
    assert not should_run_once_with_retry(1, True, 60.0)
    # retry budget exhausted (max 5)
    assert not should_run_once_with_retry(5, False, 60.0)
    # next cron run too close (<10 min) -> skip, let the cron run cover it
    assert not should_run_once_with_retry(1, False, 9.0)
    assert should_run_once_with_retry(4, False, 10.0)
