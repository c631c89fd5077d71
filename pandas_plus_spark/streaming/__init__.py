from .dedup import (accepted_against_reference, decontaminated_stream,
                    neardup_filtered_stream)
from .sessions import deduped_stream, sessionized_stream, windowed_agg_stream
from .stateful import stateful_ewm, stateful_running_total

__all__ = ["accepted_against_reference", "decontaminated_stream",
           "deduped_stream",
           "neardup_filtered_stream", "sessionized_stream",
           "windowed_agg_stream", "stateful_running_total", "stateful_ewm"]
