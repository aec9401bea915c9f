"""Time-domain operators: buffer/delay, repeater (sample-and-hold),
synchronizer, replay re-timestamping.

Reference: system/tasks/timebuffer.py, repeater.py, synchronizer.py,
replaybuffer.py. Batch formulations; streaming variants in
streamtasks_spark.streaming.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import epoch_us, rebuild_ts

from streamtasks_spark.operators.joins import asof_join, ordered_merge


def time_buffer(
    data: DataFrame, *, ts: str = "ts", delay_ms: int = 0
) -> DataFrame:
    """TimeBuffer (reference system/tasks/timebuffer.py:20-77), message-time
    mode: every row is released ``delay_ms`` after its event time. In batch
    that is a pure timestamp shift; in streaming the holdback is realized by
    a watermark of the same size."""
    return data.withColumn(
        ts,
        rebuild_ts(data, ts, epoch_us(F.col(ts)) + F.lit(delay_ms * 1000)),
    )


def synchronizer(
    streams: Sequence[DataFrame],
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    drop_late: bool = True,
    seq_col: str | None = None,
) -> DataFrame:
    """Synchronizer (reference system/tasks/synchronizer.py:14-44 over
    client/topic.py:117-141): event-time ordered merge of N streams with
    the per-stream "drop the past" late-data rule (topic.py:127)."""
    return ordered_merge(
        streams, keys=keys, ts=ts, drop_late=drop_late, seq_col=seq_col,
        stream_col="stream_idx",
    )


def repeater(
    data: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    interval_ms: int = 1000,
    value_cols: Sequence[str] | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Repeater (reference system/tasks/repeater.py:21-69): sample-and-hold
    — re-emit the latest row at a fixed rate with refreshed timestamps.

    Batch formulation: generate a per-key tick grid from the key's first
    event (exclusive) to its last event, then as-of join the latest row at
    each tick. ``sequence()`` generates ticks distributed per key — no
    driver-side loop, no cross join."""
    if value_cols is None:
        value_cols = [c for c in data.columns if c not in keys and c != ts]
    bounds = data.groupBy(*keys).agg(
        F.min(ts).alias("__t0"), F.max(ts).alias("__t1")
    )
    step_us = interval_ms * 1000
    # F.sequence(start, stop, step) raises on start > stop; a key whose event
    # span is shorter than one interval emits zero ticks (matching DuckDB
    # generate_series semantics) — filter those keys out before exploding.
    bounds = bounds.filter(
        epoch_us("__t1") >= epoch_us("__t0") + F.lit(step_us)
    )
    ticks = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                epoch_us("__t0") + F.lit(step_us),
                epoch_us("__t1"),
                F.lit(step_us),
            )
        ).alias("__tick_us"),
    ).select(*keys, rebuild_ts(data, ts, F.col("__tick_us")).alias(ts))
    src_cols = [*keys, ts, *value_cols] + (
        [seq_col] if seq_col and seq_col not in value_cols else []
    )
    held = asof_join(
        ticks,
        data.select(*src_cols),
        keys=keys,
        left_ts=ts,
        right_ts=ts,
        right_cols=list(value_cols),
        suffix="_src",
        seq_col=seq_col,
    )
    return held.select(*keys, ts, *value_cols)


def replay_rebase(
    recorded: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    new_start_ms: int = 0,
) -> DataFrame:
    """ReplayBuffer's re-timestamping step (reference system/tasks/
    replaybuffer.py:21-90): shift a recorded stream so its earliest event
    lands on ``new_start_ms`` (per key), preserving inter-row spacing."""
    w_min = F.min(epoch_us(F.col(ts))).over(
        Window.partitionBy(*[F.col(k) for k in keys])
    )
    return recorded.withColumn(
        ts,
        rebuild_ts(
            recorded, ts, epoch_us(F.col(ts)) - w_min + F.lit(new_start_ms * 1000)
        ),
    )


def replay(
    recorded: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    new_start_ms: int = 0,
    loop: int = 1,
    gap_ms: int = 0,
) -> DataFrame:
    """ReplayBuffer replay with loop (reference replaybuffer.py:21-90:
    record → on play, re-emit with rebased timestamps; ``loop`` replays
    the buffer repeatedly). Batch formulation: per key, rebase the
    earliest event to ``new_start_ms`` and emit ``loop`` copies, each
    shifted by the key's span + ``gap_ms``. Adds an ``iteration``
    column. Loop copies come from a per-row ``explode(sequence(...))``
    — distributed, no driver loop, no self-union chain."""
    if loop < 1:
        raise ValueError("loop must be >= 1")
    kw = Window.partitionBy(*[F.col(k) for k in keys])
    t0 = F.min(epoch_us(F.col(ts))).over(kw)
    span = F.max(epoch_us(F.col(ts))).over(kw) - t0
    stride = span + F.lit(gap_ms * 1000)
    out = recorded.withColumn("__t0", t0).withColumn("__stride", stride)
    out = out.withColumn(
        "iteration", F.explode(F.sequence(F.lit(0), F.lit(loop - 1)))
    )
    return out.withColumn(
        ts,
        rebuild_ts(
            recorded,
            ts,
            epoch_us(F.col(ts))
            - F.col("__t0")
            + F.lit(new_start_ms * 1000)
            + F.col("iteration") * F.col("__stride"),
        ),
    ).drop("__t0", "__stride")


def interleave_by_duration(
    streams: Sequence[DataFrame],
    *,
    keys: Sequence[str] = (),
    duration_col: str = "duration",
    seq_col: str | None = None,
    stream_col: str = "stream_idx",
    order_col: str = "mux_order",
    max_desync_ms: float | None = None,
    ts_col: str = "ts",
    drop_col: str = "dropped",
) -> DataFrame:
    """OutputContainer's cross-track interleave rule (reference
    media/outputcontainer.py:70-101): the muxer always takes the next
    packet from the stream with the LOWEST accumulated duration, so
    tracks advance together. Batch formulation: per (keys, stream),
    accumulated-duration-before-this-row = running sum of
    ``duration_col`` (ordered by ``seq_col``); the global mux order
    within keys sorts by (cum_before, stream_idx, seq). Emits all input
    rows with ``stream_idx``, ``cum_before`` and ``order_col``.

    ``max_desync_ms`` (reference outputcontainer.py:49,70-101): the muxer
    refuses to wait for a track that has fallen too far behind — the
    reference drops a packet when its timestamp is more than
    ``max_desync`` ms older than the track currently leading the mux.
    Batch formulation: the mux head position is the running max of
    ``ts_col`` over packets already muxed (strictly before this row in
    the mux order); a packet whose own timestamp lags that head by more
    than ``max_desync_ms`` is flagged in ``drop_col``. Desync is only
    possible when duration accumulation and timestamps disagree (track
    gaps) — exactly the reference's stall case. The drop window shares
    the mux window's partitioning and sort, so it costs no extra
    shuffle."""
    if seq_col is None:
        # a constant tiebreaker would make cum_before/mux_order
        # nondeterministic across runs for multi-row streams
        if all(ts_col in s.columns for s in streams):
            seq_col = ts_col
        else:
            raise ValueError(
                "interleave_by_duration needs seq_col (or a "
                f"{ts_col!r} column) for a deterministic per-stream order"
            )
    tagged = None
    for i, s in enumerate(streams):
        t = s.withColumn(stream_col, F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t, allowMissingColumns=True)
    seq_order = [F.col(seq_col).asc()]
    w_stream = (
        Window.partitionBy(*[F.col(k) for k in keys], F.col(stream_col))
        .orderBy(*seq_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the zero literal must carry the duration column's own type: a bare
    # 0.0 coerces the coalesce to DOUBLE even for integer durations, and
    # integer durations are what make the mux rank reproducible across
    # engines (cumulative double sums can differ by an ulp and flip
    # near-tie ranks)
    zero = F.lit(0).cast(tagged.schema[duration_col].dataType)
    tagged = tagged.withColumn(
        "cum_before",
        F.coalesce(F.sum(duration_col).over(w_stream), zero),
    )
    w_mux = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col("cum_before").asc(), F.col(stream_col).asc(), *seq_order
    )
    out = tagged.withColumn(order_col, F.row_number().over(w_mux))
    if max_desync_ms is not None:
        w_run = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy(F.col(order_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        head = F.max(epoch_us(F.col(ts_col))).over(w_run)
        out = out.withColumn(
            drop_col,
            F.coalesce(
                (head - epoch_us(F.col(ts_col)))
                > F.lit(int(max_desync_ms * 1000)),
                F.lit(False),  # the first muxed packet has no head to lag
            ),
        )
    return out
