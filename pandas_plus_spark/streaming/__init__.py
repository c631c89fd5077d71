from .sessions import deduped_stream, sessionized_stream, windowed_agg_stream
from .stateful import stateful_running_total

__all__ = ["deduped_stream", "sessionized_stream", "windowed_agg_stream",
           "stateful_running_total"]
