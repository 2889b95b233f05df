"""Structured Streaming surface of the engine."""

from proj_spark.streaming.geostream import (  # noqa: F401
    stream_tile_counts,
    stream_cell_session_stats,
    streaming_images_source,
)
