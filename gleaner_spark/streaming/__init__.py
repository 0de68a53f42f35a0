from .incremental import stream_pipeline, windowed_host_rates

__all__ = ["stream_pipeline", "windowed_host_rates"]
