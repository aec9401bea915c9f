"""Streaming sources (SURVEY §2.1).

- :func:`pulse_generator` — the reference PulseGenerator
  (system/tasks/pulsegenerator.py:19-34): emit a timestamp message (or a
  uuid4 IdMessage) every ``interval_ms``, built on Spark's ``rate``
  source so generation is distributed and backpressure-aware.
- :func:`parquet_stream` — file-based streaming ingestion of the
  engine's canonical parquet tables (the batch/stream duality: same
  schema, same operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import ensure_event_time


def pulse_generator(
    spark: SparkSession,
    *,
    interval_ms: int = 1000,
    id_mode: bool = False,
    partitions: int = 1,
) -> DataFrame:
    """Rate-source pulse stream. ``id_mode=False`` → (ts TIMESTAMP);
    ``id_mode=True`` → (ts, id STRING uuid4), matching the reference's
    two message modes (pulsegenerator.py:24-30)."""
    raw = spark.readStream.format("rate")
    if interval_ms <= 1000:
        # rate source takes an integer rowsPerSecond
        raw = raw.option("rowsPerSecond", str(max(1, round(1000 / interval_ms))))
        df = raw.option("numPartitions", str(partitions)).load()
    else:
        # sub-1Hz: generate at 1 Hz and keep every Nth tick
        every = max(1, round(interval_ms / 1000))
        raw = raw.option("rowsPerSecond", "1")
        df = (
            raw.option("numPartitions", str(partitions))
            .load()
            .filter(F.col("value") % every == 0)
        )
    df = df.select(F.col("timestamp").alias("ts"))
    if id_mode:
        df = df.withColumn("id", F.expr("uuid()"))
    return df


def ui_input_stream(
    spark: SparkSession,
    control_dir: str,
    *,
    value_type: str = "double",
) -> DataFrame:
    """UI input sources (reference ui/controlbase.py:101-119 — Slider /
    Switch / TextInput publish a NumberMessage/TextMessage whenever the
    human moves the control). Engine shape: the UI appends one JSON file
    per change to ``control_dir`` ({"ts": ..., "value": ...}); this is a
    streaming read of those updates. Compose with ``repeater`` for the
    reference's ``repeat_interval`` re-emit and with last_value_join to
    use as an operator control."""
    schema = f"ts timestamp, value {value_type}"
    return spark.readStream.schema(schema).json(control_dir)


def ui_set_value(control_dir: str, ts: str, value) -> None:
    """Driver-side helper: record one UI control change (one JSON file
    per update, append-only — the file-source contract)."""
    import json
    import os
    import uuid

    os.makedirs(control_dir, exist_ok=True)
    path = os.path.join(control_dir, f"{uuid.uuid4().hex}.json")
    with open(path, "w") as f:
        json.dump({"ts": ts, "value": value}, f)


def parquet_stream(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    max_files_per_trigger: int | None = None,
    ts_col: str | None = "ts",
) -> DataFrame:
    """Streaming parquet reader. A schema is required by Structured
    Streaming; pass one or let this helper infer it from the existing
    files (driver-side one-time read).

    ``ts_col`` names the event-time column to normalize on ingest:
    parquet written with isAdjustedToUTC=false reads back TIMESTAMP_NTZ,
    which watermarked operators downstream reject (the streaming
    operators also normalize at their own edge; this catches user-level
    ``withWatermark`` on the raw stream). Pass None to skip."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    if ts_col is not None and ts_col in df.columns:
        df = ensure_event_time(df, ts_col)
    return df
