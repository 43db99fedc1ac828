from lakeview_spark.operators.batcher import create_batches, batch_instants  # noqa: F401
