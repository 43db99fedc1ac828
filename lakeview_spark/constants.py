"""Engine constants, mirroring the reference's operational surface.

Reference: lakeview/src/main/java/ai/onehouse/constants/MetadataExtractorConstants.java
"""

from __future__ import annotations

from datetime import datetime

HOODIE_FOLDER_NAME = ".hoodie"
ARCHIVED_FOLDER_NAME = "archived"
HOODIE_PROPERTIES_FILE = "hoodie.properties"
TIMELINE_FOLDER_NAME = "timeline"
HISTORY_FOLDER_NAME = "history"
VERSION_MARKER_FILE = "_version_"
MANIFEST_FILE_PREFIX = "manifest_"

TIMELINE_LAYOUT_VERSION_V1 = 1
TIMELINE_LAYOUT_VERSION_V2 = 2
HOODIE_TABLE_VERSION_DEFAULT = 6
TIMELINE_LAYOUT_VERSION_DEFAULT = TIMELINE_LAYOUT_VERSION_V1

# hoodie.properties keys (MetadataExtractorConstants.java:18-22)
HOODIE_TABLE_NAME_KEY = "hoodie.table.name"
HOODIE_TABLE_TYPE_KEY = "hoodie.table.type"
HOODIE_TABLE_VERSION_KEY = "hoodie.table.version"
HOODIE_TIMELINE_LAYOUT_VERSION_KEY = "hoodie.timeline.layout.version"

# Batch sizing (MetadataExtractorConstants.java:33-34)
ACTIVE_TIMELINE_BATCH_SIZE = 20
ARCHIVED_TIMELINE_BATCH_SIZE = 2
TABLE_PROCESSING_BATCH_SIZE = 20

# Instant filename patterns (MetadataExtractorConstants.java:53-60).
# Java uses String.matches (full match) — anchor for Spark rlike.
ACTIVE_COMMIT_INSTANT_PATTERN = r"\d+(_\d+)?(\.[a-z]{1,20}){1,2}"
ARCHIVED_COMMIT_INSTANT_PATTERN = r"\.commits_\.archive\.\d+_\d+-\d+-\d+"
ARCHIVED_COMMIT_INSTANT_PATTERN_V2 = r"\d+_\d+_\d+\.parquet|manifest_\d+|" + VERSION_MARKER_FILE
V1_ARCHIVED_NUMERIC_PATTERN = r"\.archive\.(\d+)_"


def full_match(pattern: str) -> str:
    """Anchor a Java `String.matches`-style pattern for rlike (find)."""
    return f"^(?:{pattern})$"


# Action vocabulary (MetadataExtractorConstants.java:79-94)
SAVEPOINT_ACTION = "savepoint"
ROLLBACK_ACTION = "rollback"
VALID_SAVEPOINT_ROLLBACK_ACTIONS = frozenset({SAVEPOINT_ACTION, ROLLBACK_ACTION})
WHITELISTED_ACTION_TYPES = (
    "commit",
    "deltacommit",
    ROLLBACK_ACTION,
    SAVEPOINT_ACTION,
    "restore",
    "clean",
    "compaction",
    "replacecommit",
    "clustering",
    "logcompaction",
)

# tz-naive: the engine pins spark.sql.session.timeZone=UTC, and Arrow
# hands pandas UDFs tz-naive timestamps — keep every Python-side compare naive
EPOCH = datetime(1970, 1, 1)

# Initial checkpoint (MetadataExtractorConstants.java:61-69)
INITIAL_CHECKPOINT = {
    "batch_id": 0,
    "checkpoint_ts": EPOCH,
    "last_uploaded_file": "",
    "first_incomplete_commit_file": "",
    "archived_commits_processed": False,
    "last_archived_manifest_version": 0,
}
