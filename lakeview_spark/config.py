"""YAML config (SURVEY §2.1 S10).

Reference: config/ConfigLoader.java:27-116 + configv1 models — ConfigV1
{version, onehouseClientConfig, fileSystemConfiguration,
metadataExtractorConfig{jobRunMode, uploadStrategy,
pathExclusionPatterns, parserConfig[lake -> databases -> basePaths]}}.

Validation mirrors the reference's rules: version required, at least one
parserConfig entry, every database has >=1 base path, non-blank lake/db
names. PyYAML is optional (import-gated) — dict configs work everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    parser_config: list  # [{lake, databases: [{name, basePaths: [...]}]}]
    path_exclusion_patterns: list = field(default_factory=list)
    job_run_mode: str = "ONCE"  # ONCE | CONTINUOUS | ONCE_WITH_RETRY
    upload_strategy: str = "BLOCK_ON_INCOMPLETE_COMMIT"
    active_batch_size: int = 20
    archived_batch_size: int = 2
    table_batch_size: int = 20
    version: str = "V1"
    # pull-model retry policy (MetadataExtractorConfig.java:28-30 defaults)
    cron_schedule_for_pull_model: str = "0 */1 * * *"
    max_run_count_for_pull_model: int = 5
    min_interval_minutes: float = 10.0
    # CONTINUOUS dual-cadence intervals (MetadataExtractorConstants.java:
    # 37-48 defaults): discovery re-runs every 30 min; the upload POLL
    # fires every 30 s but only uploads if >=5 min passed since the
    # previous upload run started
    table_discovery_interval_minutes: float = 30.0
    process_table_metadata_sync_duration_seconds: float = 30.0
    table_metadata_upload_interval_minutes: float = 5.0


def load_config(source) -> EngineConfig:
    """Load from a dict, YAML string, or path to a YAML file."""
    if isinstance(source, dict):
        raw = source
    else:
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("PyYAML not installed; pass a dict config") from e
        import os

        text = source
        if "\n" not in source and (
            source.endswith((".yaml", ".yml")) or os.path.isfile(source)
        ):
            with open(source) as f:
                text = f.read()
        raw = yaml.safe_load(text)
    return _validate(raw)


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge, override wins (ConfigRefresher.java:39-77:
    the override file is re-fetched periodically and deep-merged onto
    the base config; lists replace, dicts merge)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config_with_override(base, override=None) -> EngineConfig:
    """Load base config and apply an optional override (dict or YAML
    path/string) — the ONCE-mode equivalent of the 2-minute refresher."""
    if isinstance(base, dict):
        raw = dict(base)
    else:
        load_config(base)  # validation side effects on the raw parse below
        import yaml  # type: ignore

        text = base
        if "\n" not in base and base.endswith((".yaml", ".yml")):
            with open(base) as f:
                text = f.read()
        raw = yaml.safe_load(text)
    if override is not None:
        if not isinstance(override, dict):
            import yaml  # type: ignore

            text = override
            if "\n" not in override and override.endswith((".yaml", ".yml")):
                with open(override) as f:
                    text = f.read()
            override = yaml.safe_load(text)
        raw = deep_merge(raw, override)
    return _validate(raw)


def _parse_cron_field(field_str: str, lo: int, hi: int) -> set[int]:
    """One UNIX cron field -> allowed value set. Supports '*', '*/n',
    'a', 'a-b', 'a-b/n', and comma lists of those."""
    allowed: set[int] = set()
    for part in field_str.split(","):
        step = 1
        if "/" in part:
            part, step_str = part.split("/", 1)
            step = int(step_str)
            if step < 1:
                raise ValueError(f"cron: invalid step in {field_str!r}")
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron: field {field_str!r} out of range [{lo},{hi}]")
        allowed.update(range(start, end + 1, step))
    return allowed


def next_cron_execution(cron_expr: str, after):
    """Next fire time of a 5-field UNIX cron expression strictly after
    ``after`` (naive UTC datetime).

    Semantics follow cron(5): fields are minute, hour, day-of-month,
    month, day-of-week (0 or 7 = Sunday); when BOTH dom and dow are
    restricted, a date matches if EITHER does. The reference estimates
    its pull-model next run the same way
    (TableDiscoveryAndUploadJob.java:126-139, UNIX cron type).
    """
    from datetime import datetime, timedelta

    parts = cron_expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron: expected 5 fields, got {cron_expr!r}")
    minutes = _parse_cron_field(parts[0], 0, 59)
    hours = _parse_cron_field(parts[1], 0, 23)
    doms = _parse_cron_field(parts[2], 1, 31)
    months = _parse_cron_field(parts[3], 1, 12)
    dows = {d % 7 for d in _parse_cron_field(parts[4], 0, 7)}
    dom_star = parts[2] == "*"
    dow_star = parts[4] == "*"

    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    end = after + timedelta(days=366 * 4 + 1)  # > any gap a real cron has
    while t < end:
        if t.month not in months:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0) + timedelta(days=32)).replace(day=1)
            continue
        # cron(5): dom OR dow when both are restricted, AND via * otherwise
        py_dow = (t.weekday() + 1) % 7  # Monday=0 -> Sunday=0 convention
        dom_ok, dow_ok = t.day in doms, py_dow in dows
        day_ok = (dom_ok or dow_ok) if (not dom_star and not dow_star) else (
            dom_ok and dow_ok
        )
        if not day_ok:
            t = t.replace(hour=0, minute=0) + timedelta(days=1)
            continue
        if t.hour not in hours:
            t = t.replace(minute=0) + timedelta(hours=1)
            continue
        if t.minute not in minutes:
            t += timedelta(minutes=1)
            continue
        return t
    raise ValueError(f"cron: no execution of {cron_expr!r} within 4 years")


def minutes_until_next_cron(cron_expr: str, now) -> float:
    """Minutes from ``now`` to the next cron fire (pull-model estimate)."""
    return (next_cron_execution(cron_expr, now) - now).total_seconds() / 60.0


def should_run_once_with_retry(
    run_count: int,
    last_run_succeeded: bool,
    minutes_until_next_cron: float,
    max_runs: int = 5,
    min_interval_minutes: float = 10.0,
) -> bool:
    """ONCE_WITH_RETRY policy (MetadataExtractorConfig.java:28-30,
    TableDiscoveryAndUploadJob.java:94-123): retry failed runs up to
    `max_runs` times, but skip when the next scheduled cron run is less
    than `min_interval_minutes` away (it will cover the work)."""
    if last_run_succeeded:
        return False
    if run_count >= max_runs:
        return False
    if minutes_until_next_cron < min_interval_minutes:
        return False
    return True


def _validate(raw: dict) -> EngineConfig:
    version = raw.get("version")
    if not version:
        raise ValueError("config: version is required")
    mec = raw.get("metadataExtractorConfig") or {}
    parser_config = mec.get("parserConfig") or []
    if not parser_config:
        raise ValueError("config: metadataExtractorConfig.parserConfig must be non-empty")
    for pc in parser_config:
        if not (pc.get("lake") or "").strip():
            raise ValueError("config: parserConfig entry missing lake")
        dbs = pc.get("databases") or []
        if not dbs:
            raise ValueError(f"config: lake {pc['lake']} has no databases")
        for db in dbs:
            if not (db.get("name") or "").strip():
                raise ValueError(f"config: lake {pc['lake']} has a database with no name")
            if not db.get("basePaths"):
                raise ValueError(
                    f"config: database {db.get('name')} must have at least one base path"
                )
    mode = mec.get("jobRunMode", "ONCE")
    if mode not in ("ONCE", "CONTINUOUS", "ONCE_WITH_RETRY"):
        raise ValueError(f"config: invalid jobRunMode {mode}")
    strategy = mec.get("uploadStrategy", "BLOCK_ON_INCOMPLETE_COMMIT")
    if strategy not in ("BLOCK_ON_INCOMPLETE_COMMIT", "CONTINUE_ON_INCOMPLETE_COMMIT"):
        raise ValueError(f"config: invalid uploadStrategy {strategy}")
    cron = mec.get("cronScheduleForPullModel", "0 */1 * * *")
    if mode == "ONCE_WITH_RETRY":
        # fail fast on an unparseable schedule instead of at retry time
        from datetime import datetime

        next_cron_execution(cron, datetime(2026, 1, 1))
    return EngineConfig(
        parser_config=parser_config,
        path_exclusion_patterns=mec.get("pathExclusionPatterns") or [],
        job_run_mode=mode,
        upload_strategy=strategy,
        version=str(version),
        cron_schedule_for_pull_model=cron,
        max_run_count_for_pull_model=int(mec.get("maxRunCountForPullModel", 5)),
        min_interval_minutes=float(mec.get("minIntervalMinutes", 10)),
        table_discovery_interval_minutes=float(
            mec.get("tableDiscoveryIntervalMinutes", 30)
        ),
        process_table_metadata_sync_duration_seconds=float(
            mec.get("processTableMetadataSyncDurationSeconds", 30)
        ),
        table_metadata_upload_interval_minutes=float(
            mec.get("tableMetadataUploadIntervalMinutes", 5)
        ),
    )
