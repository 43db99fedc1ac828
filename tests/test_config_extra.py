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


# ---- cron parsing + ONCE_WITH_RETRY / CONTINUOUS refresh wiring ----

from datetime import datetime

from lakeview_spark.config import (
    load_config,
    minutes_until_next_cron,
    next_cron_execution,
)
from lakeview_spark import runner as runner_mod
from lakeview_spark.runner import run_continuous, run_once_with_retry


def test_next_cron_execution_hourly_default():
    # reference default "0 */1 * * *" (MetadataExtractorConfig.java:28)
    assert next_cron_execution("0 */1 * * *", datetime(2026, 3, 1, 10, 30)) == datetime(
        2026, 3, 1, 11, 0
    )
    # exactly on a fire time -> strictly after
    assert next_cron_execution("0 */1 * * *", datetime(2026, 3, 1, 10, 0)) == datetime(
        2026, 3, 1, 11, 0
    )


def test_next_cron_execution_field_kinds():
    assert next_cron_execution("*/15 * * * *", datetime(2026, 3, 1, 10, 50)) == datetime(
        2026, 3, 1, 11, 0
    )
    # 2026-03-01 is a Sunday; next Monday 02:30 is 03-02
    assert next_cron_execution("30 2 * * 1", datetime(2026, 3, 1, 10, 0)) == datetime(
        2026, 3, 2, 2, 30
    )
    # dom OR dow when both restricted: fires Fri 03-06 before the 15th
    assert next_cron_execution("0 0 15 * 5", datetime(2026, 3, 1, 10, 0)) == datetime(
        2026, 3, 6, 0, 0
    )
    # month rollover
    assert next_cron_execution("0 0 1 4 *", datetime(2026, 3, 20, 10, 0)) == datetime(
        2026, 4, 1, 0, 0
    )
    assert minutes_until_next_cron("0 */1 * * *", datetime(2026, 3, 1, 10, 30)) == 30.0


def _retry_cfg(**mec_extra):
    return load_config(
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": "ONCE_WITH_RETRY",
                "parserConfig": [
                    {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
                ],
                **mec_extra,
            },
        }
    )


def test_once_with_retry_retries_until_success():
    calls = []

    def flaky(spark, config, state_dir, mirror_dir, lister):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("throttled")
        return {"tables_discovered": 0}

    attempts = run_once_with_retry(
        None,
        _retry_cfg(cronScheduleForPullModel="0 */6 * * *"),
        "/tmp/unused",
        start_time=datetime(2026, 3, 1, 1, 0),  # next cron 06:00 — far away
        run_fn=flaky,
    )
    assert [a["succeeded"] for a in attempts] == [False, False, True]


def test_once_with_retry_respects_max_run_count():
    def always_fail(*a):
        raise RuntimeError("nope")

    attempts = run_once_with_retry(
        None,
        _retry_cfg(cronScheduleForPullModel="0 */6 * * *", maxRunCountForPullModel=2),
        "/tmp/unused",
        start_time=datetime(2026, 3, 1, 1, 0),
        run_fn=always_fail,
    )
    assert len(attempts) == 2 and not any(a["succeeded"] for a in attempts)


def test_once_with_retry_stops_when_next_cron_imminent():
    def always_fail(*a):
        raise RuntimeError("nope")

    # hourly cron, start at 10:55 -> next fire 5 min away < 10 min floor
    attempts = run_once_with_retry(
        None,
        _retry_cfg(),
        "/tmp/unused",
        start_time=datetime(2026, 3, 1, 10, 55),
        run_fn=always_fail,
    )
    assert len(attempts) == 1  # no retry: scheduled run covers it


def test_continuous_mode_refreshes_override_each_round(monkeypatch, tmp_path):
    seen_strategies = []

    def fake_run_once(spark, config, state_dir, mirror_dir, lister):
        seen_strategies.append(config.upload_strategy)
        return {"ok": True}

    monkeypatch.setattr(runner_mod, "run_once", fake_run_once)

    base = {
        "version": "V1",
        "metadataExtractorConfig": {
            "jobRunMode": "CONTINUOUS",
            "parserConfig": [
                {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
            ],
        },
    }
    override = tmp_path / "override.yaml"
    override.write_text("metadataExtractorConfig:\n  uploadStrategy: BLOCK_ON_INCOMPLETE_COMMIT\n")

    def flip_override(_interval):
        # between rounds the operator edits the override file
        override.write_text(
            "metadataExtractorConfig:\n  uploadStrategy: CONTINUE_ON_INCOMPLETE_COMMIT\n"
        )

    rounds = run_continuous(
        None,
        None,
        "/tmp/unused",
        max_rounds=2,
        interval_s=0,
        base_config_source=base,
        override_source=str(override),
        sleep_fn=flip_override,
    )
    assert len(rounds) == 2
    assert seen_strategies == [
        "BLOCK_ON_INCOMPLETE_COMMIT",
        "CONTINUE_ON_INCOMPLETE_COMMIT",
    ]


def test_continuous_mode_keeps_last_good_config_on_bad_override(monkeypatch, tmp_path):
    seen = []

    def fake_run_once(spark, config, state_dir, mirror_dir, lister):
        seen.append(config.upload_strategy)
        return {}

    monkeypatch.setattr(runner_mod, "run_once", fake_run_once)
    base = {
        "version": "V1",
        "metadataExtractorConfig": {
            "jobRunMode": "CONTINUOUS",
            "parserConfig": [
                {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
            ],
        },
    }
    good = load_config(base)

    def corrupt(_):
        pass

    rounds = run_continuous(
        None,
        good,
        "/tmp/unused",
        max_rounds=2,
        interval_s=0,
        base_config_source=base,
        override_source="metadataExtractorConfig:\n  uploadStrategy: NOT_A_STRATEGY\n",
        sleep_fn=corrupt,
    )
    # invalid override -> refresh fails -> previous config stays in force
    assert len(rounds) == 2 and seen == ["BLOCK_ON_INCOMPLETE_COMMIT"] * 2


def test_load_config_from_yaml_string():
    # ConfigLoaderTest.java:78-90 (yaml-string CLI path, reference -c flag)
    from lakeview_spark.config import load_config

    cfg = load_config(
        "version: V1\n"
        "metadataExtractorConfig:\n"
        "  jobRunMode: ONCE\n"
        "  uploadStrategy: CONTINUE_ON_INCOMPLETE_COMMIT\n"
        "  parserConfig:\n"
        "    - lake: l\n"
        "      databases:\n"
        "        - name: d\n"
        "          basePaths: ['/x']\n"
    )
    assert cfg.job_run_mode == "ONCE"
    assert cfg.upload_strategy == "CONTINUE_ON_INCOMPLETE_COMMIT"


def test_load_config_invalid_yaml_raises():
    # ConfigLoaderTest.java:146-153
    import pytest as _pytest

    from lakeview_spark.config import load_config

    with _pytest.raises(Exception):
        load_config("version: V1\nmetadataExtractorConfig: [unclosed\n  - ][")


def test_continuous_mode_survives_failing_rounds_and_counts_them(monkeypatch):
    calls = []

    def flaky_run_once(spark, config, state_dir, mirror_dir, lister):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("sink exploded")
        return {"tables_discovered": 2}

    monkeypatch.setattr(runner_mod, "run_once", flaky_run_once)
    cfg = load_config(
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": "CONTINUOUS",
                "parserConfig": [
                    {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
                ],
            },
        }
    )
    rounds = run_continuous(None, cfg, "/tmp/unused", max_rounds=2, interval_s=0)
    # round 1 failed but was recorded; round 2 ran anyway
    assert [r["succeeded"] for r in rounds] == [False, True]
    assert "sink exploded" in rounds[0]["error"]
    assert rounds[1]["tables_discovered"] == 2


def test_continuous_mode_counts_config_refresh_failures(monkeypatch):
    monkeypatch.setattr(
        runner_mod, "run_once", lambda *a: {"tables_discovered": 0}
    )
    cfg = load_config(
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": "CONTINUOUS",
                "parserConfig": [
                    {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
                ],
            },
        }
    )
    rounds = run_continuous(
        None,
        cfg,
        "/tmp/unused",
        max_rounds=2,
        interval_s=0,
        base_config_source={"version": "V1"},  # invalid: no parserConfig
    )
    # every refresh fails, the last good config stays in force, and the
    # failure count is visible in each round's metrics
    assert [r["config_refresh_failures"] for r in rounds] == [1, 2]
    assert [r["config_refresh_attempts"] for r in rounds] == [1, 2]
    assert all(r["succeeded"] for r in rounds)


def test_refresh_counters_are_per_attempt_not_per_round(monkeypatch):
    """The refresh clock is independent of the round clock: a 300 s
    round at the default 100 s refresh cadence holds THREE refresh
    slices, each one attempt. The counters' unit is the attempt —
    attempts gives the denominator, so the failure rate is readable
    (r5 ADVICE: a per-round reading of the failure count inflates)."""
    monkeypatch.setattr(
        runner_mod, "run_once", lambda *a: {"tables_discovered": 0}
    )
    cfg = load_config(
        {
            "version": "V1",
            "metadataExtractorConfig": {
                "jobRunMode": "CONTINUOUS",
                "parserConfig": [
                    {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
                ],
            },
        }
    )
    rounds = run_continuous(
        None,
        cfg,
        "/tmp/unused",
        max_rounds=2,
        interval_s=300,
        refresh_interval_s=100,
        sleep_fn=lambda s: None,
        base_config_source={"version": "V1"},  # invalid: no parserConfig
    )
    # initial merge = attempt 1 (before round 1); the inter-round sleep
    # is 3 slices of 100 s = attempts 2-4 (before round 2). Every
    # attempt fails here, so failures == attempts.
    assert [r["config_refresh_attempts"] for r in rounds] == [1, 4]
    assert [r["config_refresh_failures"] for r in rounds] == [1, 4]
    assert all(r["succeeded"] for r in rounds)


def test_continuous_mode_refreshes_override_on_its_own_2min_clock(
    monkeypatch, tmp_path
):
    """ConfigRefresher.java:17,39-52: the override is re-merged every 2
    minutes on its own timer, independent of the (longer) round
    interval. With interval_s=300 and the default refresh_interval_s=120
    the inter-round sleep must be sliced [120, 120, 60] with a refresh
    after each slice, so an edit at virtual t=10 s is in force by
    t=120 s — within one refresh period, not one round period."""
    seen_strategies = []

    def fake_run_once(spark, config, state_dir, mirror_dir, lister):
        seen_strategies.append(config.upload_strategy)
        return {}

    monkeypatch.setattr(runner_mod, "run_once", fake_run_once)

    from lakeview_spark import config as runner_mod_config

    refresh_times = []
    real_loader = runner_mod_config.load_config_with_override

    def counting_loader(base, override=None):
        refresh_times.append(sum(sleeps))
        return real_loader(base, override)

    monkeypatch.setattr(
        runner_mod_config, "load_config_with_override", counting_loader
    )

    base = {
        "version": "V1",
        "metadataExtractorConfig": {
            "jobRunMode": "CONTINUOUS",
            "parserConfig": [
                {"lake": "l", "databases": [{"name": "d", "basePaths": ["/x"]}]}
            ],
        },
    }
    override = tmp_path / "override.yaml"
    override.write_text(
        "metadataExtractorConfig:\n  uploadStrategy: BLOCK_ON_INCOMPLETE_COMMIT\n"
    )

    sleeps = []

    def virtual_sleep(seconds):
        sleeps.append(seconds)
        if len(sleeps) == 1:
            # the operator edits the override 10 "seconds" into the
            # first slice (the slice's sleep models that whole span)
            override.write_text(
                "metadataExtractorConfig:\n"
                "  uploadStrategy: CONTINUE_ON_INCOMPLETE_COMMIT\n"
            )

    rounds = run_continuous(
        None,
        None,
        "/tmp/unused",
        max_rounds=2,
        interval_s=300,
        base_config_source=base,
        override_source=str(override),
        sleep_fn=virtual_sleep,
    )
    assert len(rounds) == 2
    # the inter-round gap was sliced on the refresh cadence
    assert sleeps == [120, 120, 60]
    # initial load at t=0, then one refresh per slice end
    assert refresh_times == [0, 120, 240, 300]
    # the edit landed mid-interval and round 2 ran with it in force
    assert seen_strategies == [
        "BLOCK_ON_INCOMPLETE_COMMIT",
        "CONTINUE_ON_INCOMPLETE_COMMIT",
    ]
