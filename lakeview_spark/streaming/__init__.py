from lakeview_spark.streaming.timeline_stream import (  # noqa: F401
    stream_timeline_batches,
    stream_windowed_table_stats,
)
from lakeview_spark.streaming.stateful import track_incomplete_commits  # noqa: F401
