from lakeview_spark.functions.instants import parse_instants, whitelist_filter  # noqa: F401
from lakeview_spark.functions.ids import uuid3_from_uri, uuid3_udf  # noqa: F401
from lakeview_spark.functions.aggregates import (  # noqa: F401
    ngram_udtf,
    weighted_median_udaf,
)
