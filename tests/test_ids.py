"""uuid3 parity with java.util.UUID.nameUUIDFromBytes
(TableMetadataUploaderService.java:481-483)."""

from __future__ import annotations

from lakeview_spark.functions.ids import uuid3_from_uri, uuid3_udf


def test_uuid3_known_values():
    # java.util.UUID.nameUUIDFromBytes("".getBytes()) == d41d8cd9-8f00-3204-a980-0998ecf8427e
    assert uuid3_from_uri("") == "d41d8cd9-8f00-3204-a980-0998ecf8427e"
    # UUID.nameUUIDFromBytes("s3://bucket/table".getBytes(UTF_8))
    u = uuid3_from_uri("s3://bucket/table")
    assert u[14] == "3"  # version 3
    assert u[19] in "89ab"  # IETF variant
    assert uuid3_from_uri("s3://bucket/table") == u  # deterministic


def test_uuid3_udf(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("s3://b/t1",), ("s3://b/t2",)], ["uri"])
    got = {r.uri: r.id for r in df.withColumn("id", uuid3_udf(F.col("uri"))).collect()}
    assert got["s3://b/t1"] == uuid3_from_uri("s3://b/t1")
    assert got["s3://b/t2"] == uuid3_from_uri("s3://b/t2")
