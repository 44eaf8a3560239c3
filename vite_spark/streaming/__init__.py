from vite_spark.streaming.ops import (  # noqa: F401
    DEFAULT_MAX_BUCKET_USERS,
    EVENT_SCHEMA,
    cooccur_edge_stream,
    cooccur_edge_stream_bounded,
    run_available_now,
    running_user_stats,
    session_stream,
    stream_events,
    streaming_dedup,
    windowed_event_counts,
)
