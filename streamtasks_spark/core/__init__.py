"""Core Stream wrapper: DataFrame + event-time/keys metadata with the
operator vocabulary as fluent methods. See core/stream.py."""

from streamtasks_spark.core.stream import Stream

__all__ = ["Stream"]
