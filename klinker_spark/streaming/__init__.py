from .dedup import streaming_dedup, streaming_token_blocks, windowed_event_counts
from .sessions import sessionize

__all__ = ["streaming_dedup", "streaming_token_blocks", "windowed_event_counts", "sessionize"]
