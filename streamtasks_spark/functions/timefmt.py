"""strftime → Spark datetime-pattern translation.

The reference's TimeToText task formats a message timestamp with python
strftime (/root/reference/streamtasks/system/tasks/timetotext.py:19-37).
Spark's ``date_format`` uses Java DateTimeFormatter patterns, so we
translate; DuckDB's oracle side natively speaks strftime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import epoch_us

_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%p": "a",
    "%A": "EEEE",
    "%a": "EEE",
    "%B": "MMMM",
    "%b": "MMM",
    "%z": "xx",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a strftime pattern into a Spark/Java datetime pattern.
    Literal runs are single-quoted so alphabetic characters aren't
    interpreted as pattern letters."""
    out: list[str] = []
    literal: list[str] = []

    def flush() -> None:
        if literal:
            text = "".join(literal)
            if any(c.isalpha() for c in text):
                out.append("'" + text.replace("'", "''") + "'")
            else:
                out.append(text)
            literal.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code in _STRFTIME_TO_JAVA:
                flush()
                out.append(_STRFTIME_TO_JAVA[code])
                i += 2
                continue
        literal.append(fmt[i])
        i += 1
    flush()
    return "".join(out)


def time_to_text(ts: Column, fmt: str) -> Column:
    """TimeToText: format an event-time column with a strftime pattern."""
    return F.date_format(ts, strftime_to_java(fmt))


def timestamp_update(
    ts: Column, *, offset_ms: int = 0, use_wall_clock: bool = False
) -> Column:
    """TimestampUpdater (reference system/tasks/timestampupdater.py:19-41):
    rewrite event time from message time or wall clock, plus an offset.

    Output is always TIMESTAMP (LTZ): this is a Column-level function
    with no DataFrame in scope, so it cannot inspect the input column's
    type to preserve TIMESTAMP_NTZ the way the DataFrame-level operators
    do (``core.timeutil.rebuild_ts``). NTZ callers who need the input
    type back should ``.cast("timestamp_ntz")`` the result (exact under
    the UTC session timezone that ``get_spark`` pins)."""
    base = F.current_timestamp() if use_wall_clock else ts
    # micros arithmetic: preserves sub-millisecond event-time precision
    return F.timestamp_micros(
        (epoch_us(base) + F.lit(offset_ms * 1000)).cast("long")
    )
