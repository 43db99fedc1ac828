from lakeview_spark.pipeline import dedup, similarity, text, multimodal, clustering  # noqa: F401
