from .sessions import sessionized_stream, windowed_agg_stream

__all__ = ["sessionized_stream", "windowed_agg_stream"]
