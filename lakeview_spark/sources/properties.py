"""hoodie.properties reader (SURVEY §2.1 S4).

Reference: HoodiePropertiesReader.java:37-61 — java.util.Properties over a
byte stream; keys hoodie.table.{name,type,version} and
hoodie.timeline.layout.version with defaults (table_version=6, layout=1,
MetadataExtractorConstants.java:25-28).

Spark-first: ALL tables' properties files are parsed in one distributed
job — `spark.read.text` over the full path list, provenance via
input_file_name(), key=value split, and a first()-per-key pivot. One scan,
no per-table round trips; at a million tables this is one map stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.constants import (
    HOODIE_TABLE_NAME_KEY,
    HOODIE_TABLE_TYPE_KEY,
    HOODIE_TABLE_VERSION_KEY,
    HOODIE_TIMELINE_LAYOUT_VERSION_KEY,
    HOODIE_TABLE_VERSION_DEFAULT,
    TIMELINE_LAYOUT_VERSION_DEFAULT,
)

_KEYS = {
    HOODIE_TABLE_NAME_KEY: "table_name",
    HOODIE_TABLE_TYPE_KEY: "table_type",
    HOODIE_TABLE_VERSION_KEY: "table_version",
    HOODIE_TIMELINE_LAYOUT_VERSION_KEY: "timeline_layout_version",
}


def read_hoodie_properties(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Parse hoodie.properties files -> one row per file.

    Output: path, table_name, table_type, table_version,
    timeline_layout_version (defaults applied via coalesce).
    """
    if not paths:
        return spark.createDataFrame(
            [],
            "path string, table_name string, table_type string, "
            "table_version int, timeline_layout_version int",
        )
    lines = (
        spark.read.text(paths)
        .withColumn("path", F.input_file_name())
        .filter(~F.col("value").startswith("#") & (F.trim("value") != ""))
        .withColumn("key", F.trim(F.split("value", "=", 2)[0]))
        .withColumn("val", F.trim(F.split("value", "=", 2)[1]))
    )
    pivoted = lines.groupBy("path").agg(
        *[
            F.first(F.when(F.col("key") == k, F.col("val")), ignorenulls=True).alias(alias)
            for k, alias in _KEYS.items()
        ]
    )
    return pivoted.select(
        "path",
        "table_name",
        "table_type",
        F.coalesce(
            F.col("table_version").try_cast("int"), F.lit(HOODIE_TABLE_VERSION_DEFAULT)
        ).alias("table_version"),
        F.coalesce(
            F.col("timeline_layout_version").try_cast("int"),
            F.lit(TIMELINE_LAYOUT_VERSION_DEFAULT),
        ).alias("timeline_layout_version"),
    )
