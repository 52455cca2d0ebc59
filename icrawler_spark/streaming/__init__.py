"""Structured Streaming twins of the incremental operators (SURVEY §2.11)."""

from .jobs import (
    run_available_now,
    streaming_dedup,
    streaming_hourly_rollup,
    streaming_page_ingest,
)

__all__ = [
    "streaming_hourly_rollup",
    "streaming_dedup",
    "streaming_page_ingest",
    "run_available_now",
]
