"""Event-time column helpers shared by every operator.

The engine's time model (SURVEY §1.3): event time is a per-row
timestamp; operators do microsecond arithmetic on it. Spark has TWO
timestamp types — TIMESTAMP (with local-tz semantics) and
TIMESTAMP_NTZ — and ``F.unix_micros`` accepts only the former, so any
operator calling it directly breaks on NTZ inputs (parquet written with
isAdjustedToUTC=false reads back as NTZ by default). Normalizing
through ``cast("timestamp")`` accepts both: for LTZ it is a no-op; for
NTZ it applies the session timezone, which is pinned to UTC in
``get_spark``. Gap/tolerance/bucket arithmetic on NTZ inputs is exact
for any FIXED-OFFSET session timezone (the offset cancels in
differences); a DST-observing session zone would map wall times
straddling a transition with different offsets, so sessions handling
NTZ event time should stay on UTC (or another fixed offset) — which
``get_spark`` guarantees.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds from a TIMESTAMP or TIMESTAMP_NTZ column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def rebuild_ts(df, ts: str, us: Column) -> Column:
    """Rebuild an event-time column from epoch microseconds, preserving
    the input column's timestamp flavor. ``F.timestamp_micros`` always
    returns TIMESTAMP (LTZ); operators that shift/bucket event time with
    it would silently emit LTZ for TIMESTAMP_NTZ inputs, drifting the
    output schema from the input schema for downstream NTZ consumers.
    With the session timezone pinned to UTC (``get_spark``) the
    LTZ→NTZ cast is an exact round-trip."""
    from pyspark.sql.types import TimestampNTZType

    col = F.timestamp_micros(us.cast("long"))
    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        col = col.cast("timestamp_ntz")
    return col


def ensure_event_time(df, ts: str = "ts"):
    """Cast an NTZ event-time column to TIMESTAMP so Structured
    Streaming accepts it: ``withWatermark`` (and therefore every
    watermarked window/dedup/state operator) hard-rejects
    TIMESTAMP_NTZ. Batch operators take either type via
    :func:`epoch_us`; call this only at the streaming edge. No-op when
    the column is already TIMESTAMP, so it is safe to apply
    unconditionally."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts].dataType, TimestampNTZType):
        return df.withColumn(ts, F.col(ts).cast("timestamp"))
    return df
