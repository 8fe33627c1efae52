from .dedup import streaming_dedup, streaming_token_blocks, windowed_event_counts
from .join import stream_interval_join
from .sessions import sessionize
from .sinks import foreach_batch_sink, write_stream_parquet
from .stateful import running_user_stats, running_user_stats_tws

__all__ = [
    "streaming_dedup",
    "streaming_token_blocks",
    "windowed_event_counts",
    "stream_interval_join",
    "sessionize",
    "foreach_batch_sink",
    "write_stream_parquet",
    "running_user_stats",
    "running_user_stats_tws",
]
