"""Structured Streaming surface (SURVEY.md §2.9, OP-43..47).

The reference declares a streaming serving mode but never implements it
(ServingMode.STREAMING, feature_server.py:38; refresh_frequency="realtime",
feature_registry.py:105).  This package makes it real.
"""

from feature_store_healthcare_spark.streaming.pipeline import (
    read_cdc_state,
    session_window_features,
    sliding_window_features,
    stream_events,
    streaming_band_maintenance,
    streaming_cdc_apply,
    streaming_dedup,
    streaming_ivf_maintenance,
    streaming_online_upsert,
    streaming_postings_maintenance,
    tumbling_window_features,
)

__all__ = [
    "stream_events",
    "tumbling_window_features",
    "sliding_window_features",
    "session_window_features",
    "streaming_dedup",
    "streaming_online_upsert",
    "streaming_cdc_apply",
    "read_cdc_state",
    "streaming_postings_maintenance",
    "streaming_band_maintenance",
    "streaming_ivf_maintenance",
]
