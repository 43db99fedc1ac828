"""LSM archived-timeline manifest reader (SURVEY §2.1 S5, §2.3 J4).

Reference: LSMTimelineManifestReader.java:23-38,104-154 — `_version_` is a
single int (the latest manifest version); `manifest_N` is JSON
{"files":[{"fileName":..., "fileLen":...}]}. The V2 incremental rule is a
snapshot diff: upload only parquet names present in the current manifest
but absent from the previous one (TimelineCommitInstantsUploader.java:277-318).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.schemas import MANIFEST_SCHEMA


def read_manifest_version(spark: SparkSession, version_file: str) -> int:
    """Read `_version_` (single int, LSMTimelineManifestReader.java:121-124).

    Driver-side read: Hadoop's hidden-file filter drops `_`-prefixed paths
    from spark.read, and the file is a single integer — there is nothing to
    distribute. For object stores, swap open() for an fsspec/boto3 get.
    """
    with open(version_file) as f:
        text = f.read().strip()
    if not text:
        raise ValueError(f"empty _version_ file: {version_file}")
    return int(text)


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    """manifest_N JSON -> DataFrame(fileName, fileLen), one row per file."""
    raw = spark.read.json(manifest_path, schema=MANIFEST_SCHEMA, multiLine=True)
    return raw.select(F.explode("files").alias("f")).select(
        F.col("f.fileName").alias("fileName"), F.col("f.fileLen").alias("fileLen")
    )


def manifest_diff(current: DataFrame, previous: DataFrame | None) -> DataFrame:
    """Files to upload = current manifest names minus previous (anti join)."""
    if previous is None:
        return current
    return current.join(previous.select("fileName"), "fileName", "left_anti")
