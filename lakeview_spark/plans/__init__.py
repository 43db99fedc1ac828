from lakeview_spark.plans.registry import QUERIES, ORACLES, register  # noqa: F401
from lakeview_spark.plans import analytics, coverage, tpch_extra, product  # noqa: F401  (registers on import)
from lakeview_spark import pipeline  # noqa: F401  (registers dedup/similarity/text/multimodal)
