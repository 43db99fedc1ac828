from lakeview_spark.streaming.timeline_stream import (  # noqa: F401
    stream_timeline_batches,
    stream_windowed_table_stats,
)
from lakeview_spark.streaming.stateful import (  # noqa: F401
    cusum_detector,
    sequence_packer,
    stream_sequence_pack,
    stream_value_cusum,
    track_incomplete_commits,
)
from lakeview_spark.streaming.pipeline_stream import (  # noqa: F401
    document_stream,
    stream_curation_funnel,
    stream_document_dedup,
    stream_quality_filter,
    stream_embedding_neardup,
    stream_event_sessions,
    stream_token_stats,
    stream_anomaly_zscore,
    boilerplate_screen,
    stream_boilerplate_filter,
    stream_classifier_gate,
)
