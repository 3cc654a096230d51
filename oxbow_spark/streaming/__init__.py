from oxbow_spark.streaming.ops import (  # noqa: F401
    events_stream,
    run_available_now,
    sessionize_state,
    stream_dedup,
    stream_depth,
    stream_zoom,
)
