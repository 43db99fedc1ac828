"""File-content source (SURVEY §2.1 S6): read timeline file payloads as
binary for mirroring/verification.

Reference: S3AsyncStorageClient.streamFileAsync (:118-136) returns an
InputStream + size per file; the Spark-native equivalent is the
`binaryFile` datasource — distributed, with path/length/modificationTime
metadata columns and the 5 MB chunking concern delegated to the sink
(PresignedUrlFileUploader.java:74-119 ~ foreachPartition streaming PUT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_file_contents(
    spark: SparkSession, glob_path: str, path_filter: str | None = None
) -> DataFrame:
    """binaryFile scan -> (path, filename, length, modification_time,
    content, content_sha256). `pathGlobFilter` prunes at the listing
    level (the reader never opens non-matching files)."""
    reader = spark.read.format("binaryFile")
    if path_filter:
        reader = reader.option("pathGlobFilter", path_filter)
    df = reader.load(glob_path)
    return df.select(
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        F.col("length"),
        F.col("modificationTime").alias("modification_time"),
        F.col("content"),
        F.sha2("content", 256).alias("content_sha256"),
    )


def verify_mirror(
    spark: SparkSession, source_glob: str, mirror_glob: str
) -> DataFrame:
    """Join source and mirror by filename and compare digests — the
    content-integrity check a real mirror pipeline runs after upload.
    Returns rows that are missing or corrupt in the mirror."""
    src = read_file_contents(spark, source_glob).select(
        "filename", F.col("content_sha256").alias("src_sha"), F.col("length").alias("src_len")
    )
    dst = read_file_contents(spark, mirror_glob).select(
        "filename", F.col("content_sha256").alias("dst_sha"), F.col("length").alias("dst_len")
    )
    joined = src.join(dst, "filename", "left")
    return joined.filter(
        F.col("dst_sha").isNull() | (F.col("src_sha") != F.col("dst_sha"))
    ).select("filename", "src_len", "dst_len", "src_sha", "dst_sha")
