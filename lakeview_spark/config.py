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


def load_config(source) -> EngineConfig:
    """Load from a dict, YAML string, or path to a YAML file."""
    if isinstance(source, dict):
        raw = source
    else:
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("PyYAML not installed; pass a dict config") from e
        text = source
        if "\n" not in source and source.endswith((".yaml", ".yml")):
            with open(source) as f:
                text = f.read()
        raw = yaml.safe_load(text)
    return _validate(raw)


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
    return EngineConfig(
        parser_config=parser_config,
        path_exclusion_patterns=mec.get("pathExclusionPatterns") or [],
        job_run_mode=mode,
        upload_strategy=strategy,
        version=str(version),
    )
