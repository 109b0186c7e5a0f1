from stream_spark.streaming.jobs import (
    run_paced_stream_to_memory,
    streaming_asof_enrich,
    run_stream_to_memory,
    streaming_sliding_count,
    streaming_sliding_time_window,
    streaming_tumbling_count,
    streaming_tumbling_count_accumulate,
    streaming_tumbling_count_array,
    streaming_tumbling_time_window,
    streaming_heavy_hitters,
    streaming_windowed_approx_distinct,
)
from stream_spark.streaming.sources import (
    file_replay_stream,
    ordered_replay_stream,
    paced_replay_stream,
    rate_stream,
)
from stream_spark.streaming.telemetry import TelemetryListener

__all__ = [
    "file_replay_stream",
    "ordered_replay_stream",
    "paced_replay_stream",
    "rate_stream",
    "run_paced_stream_to_memory",
    "run_stream_to_memory",
    "streaming_tumbling_time_window",
    "streaming_sliding_time_window",
    "streaming_tumbling_count",
    "streaming_tumbling_count_accumulate",
    "streaming_tumbling_count_array",
    "streaming_sliding_count",
    "streaming_asof_enrich",
    "streaming_heavy_hitters",
    "streaming_windowed_approx_distinct",
    "TelemetryListener",
]
