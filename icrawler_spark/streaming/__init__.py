"""Structured Streaming twins of the incremental operators (SURVEY §2.11)."""

from .jobs import streaming_dedup, streaming_hourly_rollup, run_available_now

__all__ = ["streaming_hourly_rollup", "streaming_dedup", "run_available_now"]
