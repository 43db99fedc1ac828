"""Checkpoint store (SURVEY §2.1 S8/S9, §2.9 exactly-once state).

Reference keeps per-table incremental state via a REST upsert
(OnehouseApiClient.java:69-105); our engine persists the `checkpoints`
dataset as parquet with MERGE-by-key semantics:

- `load()` -> checkpoints DataFrame (empty -> typed empty DF)
- `upsert(updates)` -> last-writer-wins per table_id, idempotent under
  re-run (same batch re-applied => same state, SURVEY §7.3.5)
- `initialize_tables(tables)` -> anti-join new tables against existing
  checkpoints (J2) and seed INITIAL_CHECKPOINT rows
  (TableMetadataUploaderService.java:125-132, MetadataExtractorConstants.java:61-69)

Parquet + atomic directory swap is the local stand-in for a Delta/Hudi
`MERGE INTO`; the store is tiny (one row per table) so a coalesced
single-file write is correct at any scale — a billion tables is ~100 GB,
still a broadcast-side dimension.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.constants import INITIAL_CHECKPOINT
from lakeview_spark.schemas import CHECKPOINTS_SCHEMA


class CheckpointStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> DataFrame:
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return self.spark.read.schema(CHECKPOINTS_SCHEMA).parquet(self.path)
        return self.spark.createDataFrame([], CHECKPOINTS_SCHEMA)

    def upsert(self, updates: DataFrame) -> None:
        """MERGE INTO checkpoints USING updates ON table_id (last-writer-wins)."""
        current = self.load()
        merged = current.join(updates.select("table_id"), "table_id", "left_anti").unionByName(
            updates.select(*[f.name for f in CHECKPOINTS_SCHEMA.fields])
        )
        self._atomic_overwrite(merged)

    def initialize_tables(self, tables: DataFrame) -> int:
        """Seed INITIAL_CHECKPOINT rows for tables with no checkpoint (S9/J2)."""
        current = self.load()
        new_tables = tables.select("table_id").join(current, "table_id", "left_anti")
        seeded = new_tables.select(
            "table_id",
            F.lit(INITIAL_CHECKPOINT["batch_id"]).alias("batch_id"),
            F.lit(INITIAL_CHECKPOINT["checkpoint_ts"]).cast("timestamp").alias("checkpoint_ts"),
            F.lit(INITIAL_CHECKPOINT["last_uploaded_file"]).alias("last_uploaded_file"),
            F.lit(INITIAL_CHECKPOINT["first_incomplete_commit_file"]).alias(
                "first_incomplete_commit_file"
            ),
            F.lit(INITIAL_CHECKPOINT["archived_commits_processed"]).alias(
                "archived_commits_processed"
            ),
            F.lit(INITIAL_CHECKPOINT["last_archived_manifest_version"]).alias(
                "last_archived_manifest_version"
            ),
        )
        n = seeded.count()
        if n:
            self.upsert(seeded)
        return n

    def _atomic_overwrite(self, df: DataFrame) -> None:
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
