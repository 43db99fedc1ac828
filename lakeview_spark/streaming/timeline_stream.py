"""Structured Streaming equivalents of the reference's CONTINUOUS mode
(SURVEY §2.9).

The reference is a hand-rolled micro-batch system: 30 s poll, per-table
checkpoint state, watermark on file last_modified, strictly ordered
batches per table (TableDiscoveryAndUploadJob.java:63-139). Spark
Structured Streaming has all four concepts natively:

- trigger           <-> Trigger.ProcessingTime / AvailableNow
- checkpointTimestamp watermark <-> withWatermark on last_modified
- per-table ordered batches     <-> foreachBatch + the batch engine
  (batch_instants), which is already deterministic per table
- exactly-once state            <-> checkpointLocation + idempotent
  CheckpointStore MERGE inside foreachBatch

`stream_timeline_batches` wires a file-discovery stream of timeline
listings into the batch engine via foreachBatch — the recommended shape
when the per-batch logic is already a battle-tested batch pipeline.

`stream_windowed_table_stats` is the pure-streaming path (A6 as a
stream): tumbling-window commit stats with late-data handling via
watermark — runs fully inside the streaming engine, no foreachBatch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeview_spark.operators.batcher import BLOCK, batch_instants
from lakeview_spark.schemas import FILES_SCHEMA


def timeline_file_stream(
    spark: SparkSession, listing_dir: str, max_files_per_trigger: int = 1000
) -> DataFrame:
    """File-source stream of timeline listings (json lines with
    FILES_SCHEMA fields) — the streaming analog of the S3-listing poll.

    maxFilesPerTrigger bounds each micro-batch like the reference's
    page-size bound on ListObjectsV2.
    """
    return (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(listing_dir)
    )


def stream_timeline_batches(
    spark: SparkSession,
    listing_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_batch_size: int = 20,
    strategy: str = BLOCK,
    extra_sink: Callable[[DataFrame, int], None] | None = None,
):
    """Stream listings -> commit-group batches, exactly-once.

    foreachBatch runs the batch engine per micro-batch: each trigger's
    new listing rows are grouped into commit batches per table and
    written to `output_dir` partitioned by (stream_batch_id, table_id).
    Exactly-once comes from making the sink IDEMPOTENT, not just from
    the commit log: foreachBatch is at-least-once on failure replay, so
    the write uses dynamic partition overwrite keyed on the micro-batch
    id — a replayed batch N rewrites exactly the stream_batch_id=N
    partitions and leaves every other batch untouched (reference
    parity: checkpoint upsert after each successful batch, §2.9).
    """
    stream = timeline_file_stream(spark, listing_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batches = batch_instants(
            batch_df.select("table_id", "filename", "last_modified"),
            max_batch_size,
            strategy,
        ).withColumn("stream_batch_id", F.lit(batch_id))
        (
            batches.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("stream_batch_id", "table_id")
            .parquet(output_dir)
        )
        if extra_sink is not None:
            extra_sink(batches, batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_table_stats(
    spark: SparkSession,
    listing_dir: str,
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """A6 as a stream: per-table tumbling-window file counts/bytes with
    late-data tolerance.

    withWatermark bounds state exactly like the reference's
    checkpointTimestamp: rows older than (max event time - delay) are
    dropped and their windows finalized. Output mode `update` emits
    refined windows as late rows arrive.
    """
    stream = timeline_file_stream(spark, listing_dir)
    return (
        stream.withWatermark("last_modified", watermark_delay)
        .groupBy(
            F.window("last_modified", window_duration).alias("win"),
            "table_id",
        )
        .agg(
            F.count("*").alias("file_count"),
            F.sum("size").alias("total_bytes"),
        )
        .select(
            "table_id",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "file_count",
            "total_bytes",
        )
    )
