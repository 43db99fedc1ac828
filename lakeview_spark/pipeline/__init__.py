from lakeview_spark.pipeline import dedup, similarity, text, multimodal  # noqa: F401
