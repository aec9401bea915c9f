"""Observability sinks — the WebViewer / VideoViewer / display tier
(reference system/task_web.py:382-396, ui/*viewer*). The reference
pushes topics to a browser over websockets; the engine analog is a
started streaming query into an inspectable sink. These are thin,
uniform helpers so a Pipeline sink config can name them.

- :func:`memory_viewer` — queryable in-session table (the dev UI).
- :func:`console_viewer` — stdout tail of a stream.
- :func:`foreach_batch_viewer` — the escape hatch the reference's
  websocket push maps to: a driver callback per micro-batch (push to
  websocket/HTTP/metrics from here).
- the actual browser transport lives in streaming/webviewer.py:
  :class:`TopicWebSocketServer` (stdlib RFC 6455 server) +
  :func:`websocket_viewer` (foreachBatch push with the reference's
  ``{"type": "data"|"control", "data": ...}`` envelope).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def memory_viewer(df: DataFrame, name: str, *, checkpoint: str):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def console_viewer(df: DataFrame, *, checkpoint: str, num_rows: int = 20):
    return (
        df.writeStream.format("console")
        .outputMode("append")
        .option("numRows", str(num_rows))
        .option("truncate", "true")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def foreach_batch_viewer(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    *,
    checkpoint: str,
):
    """Driver callback per micro-batch — push rows to a websocket,
    dashboard, or metrics store (the WebViewer transport point)."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .start()
    )
