"""Stateful stream operators — batch (event-time window) formulations.

Each operator here reproduces the semantics of a reference task
(/root/reference/streamtasks/system/tasks/*.py) as a pure DataFrame
transformation over event-time windows, so the same logic is checkable
against a SQL oracle. Streaming (applyInPandasWithState) variants live in
streamtasks_spark.streaming.stateful.

All operators take ``keys`` — the stream-identity columns that partition
state. At 100 TB this is what makes them scale: state is per-key, shuffled
once, sorted within partitions; no global windows unless keys=().
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import epoch_us, rebuild_ts

from streamtasks_spark.operators.joins import last_value_join


def gate(
    data: DataFrame,
    control: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    control_value: str = "value",
    initial_open: bool = False,
    seq_col: str | None = None,
    fail_mode: str = "open",
) -> DataFrame:
    """Gate (reference system/tasks/gate.py:15-110): pass data rows while
    the latest control value as of the row's event time is > 0.5. Control
    takes effect BEFORE data at equal timestamps (gate.py:50-54).

    ``initial_open`` governs rows arriving before any control message —
    the reference's ``initial_control`` (gate.py:32, default False/closed).

    ``fail_mode`` (reference ``GateFailMode``, gate.py:15-17,39-43): an
    INVALID control message — modeled as a NULL ``control_value``, the
    batch analog of a NumberMessage validation error — never updates the
    latched control (the as-of join skips NULLs, mirroring gate.py:76-81
    where a ValidationError leaves ``state.control`` untouched). Under
    ``"open"`` (reference default) that is the whole story; under
    ``"closed"`` the gate is additionally FORCED closed while the most
    recent control row (valid or not) is invalid (gate.py:41-42).
    Pause-as-data is modeled separately by :func:`pause_state`."""
    if fail_mode not in ("open", "closed"):
        raise ValueError(f"gate: fail_mode must be open|closed, got {fail_mode!r}")
    ctl_cols = [*keys, ts, F.col(control_value).alias("value")]
    if seq_col is not None and seq_col in control.columns:
        ctl_cols.append(seq_col)
    ctl = control.select(*ctl_cols)
    controls = {"__gate_ctl": ctl}
    if fail_mode == "closed":
        # badness indicator of the LATEST control row: 1.0 when invalid.
        # Non-null by construction, so the as-of yields the newest row's
        # validity even though the value latch skipped the invalid one.
        controls["__gate_bad"] = ctl.withColumn(
            "value", F.col("value").isNull().cast("double")
        )
    joined = last_value_join(
        data,
        controls,
        keys=keys,
        ts=ts,
        control_first=True,
        seq_col=seq_col,
    )
    open_ = F.coalesce(
        F.col("__gate_ctl") > F.lit(0.5), F.lit(bool(initial_open))
    )
    if fail_mode == "closed":
        open_ = open_ & ~F.coalesce(
            F.col("__gate_bad") > F.lit(0.5), F.lit(False)
        )
        return joined.filter(open_).drop("__gate_ctl", "__gate_bad")
    return joined.filter(open_).drop("__gate_ctl")


def pause_state(
    data: DataFrame,
    control: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    control_value: str = "value",
    initial_paused: bool = False,
    seq_col: str | None = None,
    out_col: str = "paused",
) -> DataFrame:
    """Pause/control propagation as data (reference TopicControlMessage:
    net/messages.py:35-40; the switch latches the last pause state per
    topic and replays it to late subscribers, net/__init__.py:285-287,
    317-321; operators forward it downstream, timestampupdater.py:31-32).

    Control-as-data convention (SURVEY §7.3): a pause stream is a
    boolean-as-float stream; each data row is annotated with the latched
    paused state as of its event time (control before data at equal
    timestamps — same rule as gate). The "replay to late joiners" is
    exactly the latch: a subscriber reading from any point sees
    ``last(paused)``. Downstream pause forwarding = carrying this column
    through; gate's close-by-pausing (gate.py:82-85) =
    ``pause_state(...)`` with the gate's inverted control."""
    ctl_cols = [*keys, ts, F.col(control_value).alias("value")]
    if seq_col is not None and seq_col in control.columns:
        ctl_cols.append(seq_col)
    joined = last_value_join(
        data,
        {"__pause_ctl": control.select(*ctl_cols)},
        keys=keys,
        ts=ts,
        control_first=True,
        seq_col=seq_col,
    )
    return joined.withColumn(
        out_col,
        F.coalesce(F.col("__pause_ctl") > F.lit(0.5), F.lit(bool(initial_paused))),
    ).drop("__pause_ctl")


def switch(
    pairs: Sequence[tuple[DataFrame, DataFrame]],
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    control_value: str = "value",
    seq_col: str | None = None,
) -> DataFrame:
    """Switch / mux (reference system/tasks/switch.py:21-81): N (input,
    control) pairs; route to the output only rows of the pair whose control
    currently has the maximum value (argmax, switch.py:69-72). Rows arriving
    before any control message are dropped (selected index -1). Ties break
    to the lowest pair index (deterministic refinement of the reference's
    dict-iteration order)."""
    data0, _ = pairs[0]

    def ctl_sel(c: DataFrame) -> DataFrame:
        cols = [*keys, ts, F.col(control_value).alias("value")]
        if seq_col is not None and seq_col in c.columns:
            cols.append(seq_col)
        return c.select(*cols)

    controls = {f"__sw_ctl_{i}": ctl_sel(c) for i, (_, c) in enumerate(pairs)}
    tagged = None
    for i, (d, _) in enumerate(pairs):
        t = d.select(*data0.columns).withColumn("__pair", F.lit(i))
        tagged = t if tagged is None else tagged.unionByName(t)

    joined = last_value_join(
        tagged,
        controls,
        keys=keys,
        ts=ts,
        control_first=True,
        seq_col=seq_col,
    )
    ctl_cols = [F.col(f"__sw_ctl_{i}") for i in range(len(pairs))]
    max_ctl = F.greatest(*ctl_cols) if len(pairs) > 1 else ctl_cols[0]
    # lowest index holding the max wins ties (NULL controls fall through)
    selected = F.lit(len(pairs) - 1)
    for i in range(len(pairs) - 2, -1, -1):
        selected = F.when(ctl_cols[i] == max_ctl, F.lit(i)).otherwise(selected)
    sel = F.when(max_ctl.isNotNull(), selected)
    return (
        joined.filter(sel == F.col("__pair"))
        .drop("__pair", *[f"__sw_ctl_{i}" for i in range(len(pairs))])
    )


def sr_latch(
    set_stream: DataFrame,
    reset_stream: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    value_col: str = "value",
    default: bool = False,
    seq_col: str | None = None,
) -> DataFrame:
    """SR latch (reference system/tasks/srlatch.py:20-55). Keeps the latest
    boolean (value > 0.5) seen on each of set/reset; on every incoming
    message emits the latched value, which flips only when exactly one of
    (set, reset) is currently true (srlatch.py:51-54). Output: one row per
    input event with columns keys + ts + value (1.0/0.0).

    Ordering: without ``seq_col``, ties order as reset-before-set at
    equal ts — but two SAME-source events at identical (keys, ts) are
    order-undefined (the fold's result can differ between runs or
    engines). Pass ``seq_col`` (any unique, monotone-per-arrival
    column) to make the fold a total order; the reference never faces
    this because a stream arrives already totally ordered."""
    seq_cols = [seq_col] if seq_col is not None else []
    s = set_stream.select(
        *keys, ts, *seq_cols,
        F.col(value_col).alias("__v"), F.lit("set").alias("__src"),
    )
    r = reset_stream.select(
        *keys, ts, *seq_cols,
        F.col(value_col).alias("__v"), F.lit("reset").alias("__src"),
    )
    u = s.unionByName(r)
    order = [F.col(ts).asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc())
    else:
        order.append(F.col("__src").asc())  # deterministic: reset before set
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    set_b = F.coalesce(
        F.last(F.when(F.col("__src") == "set", F.col("__v")), ignorenulls=True).over(w) > 0.5,
        F.lit(False),
    )
    reset_b = F.coalesce(
        F.last(F.when(F.col("__src") == "reset", F.col("__v")), ignorenulls=True).over(w) > 0.5,
        F.lit(False),
    )
    step = F.when(set_b != reset_b, F.when(set_b, F.lit(1.0)).otherwise(F.lit(0.0)))
    latched = F.coalesce(
        F.last(step, ignorenulls=True).over(w),
        F.lit(1.0 if default else 0.0),
    )
    return u.withColumn("value", latched).select(*keys, ts, "value")


def message_detector(
    data: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    timeout_ms: int = 1000,
) -> DataFrame:
    """MessageDetector (reference system/tasks/messagedetector.py:50-88):
    signal 1.0 while messages arrive, 0.0 after ``timeout_ms`` of silence.
    Batch formulation emits the signal *transitions*: a (ts, 1.0) row when a
    message arrives after silence (or first ever), and a (prev_ts + timeout,
    0.0) row when a gap exceeds the timeout (or the stream ends).

    Deliberate non-parity: the reference's ``MessageDetectorFailMode``
    (messagedetector.py:15-17,44-49) governs messages whose TIMESTAMP
    fails to parse — but an event-time batch row without a timestamp has
    no position on the time axis at all, so the knob is unmodelable
    here (unlike the gate's fail_mode, where the invalid CONTROL VALUE
    rides a valid timestamp). Rows with a NULL ``ts`` should be
    filtered/repaired upstream; the streaming twin's arrival-order
    processing is where a timestampless message could even exist."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(ts).asc())
    gaps = data.select(*keys, ts).withColumn(
        "__prev", F.lag(ts).over(w)
    ).withColumn("__next", F.lead(ts).over(w))
    timeout_us = timeout_ms * 1000
    gap_us = epoch_us(F.col(ts)) - epoch_us(F.col("__prev"))
    next_gap_us = epoch_us(F.col("__next")) - epoch_us(F.col(ts))

    ups = gaps.filter(
        F.col("__prev").isNull() | (gap_us > F.lit(timeout_us))
    ).select(*keys, F.col(ts).alias(ts), F.lit(1.0).alias("value"))
    downs = gaps.filter(
        F.col("__next").isNull() | (next_gap_us > F.lit(timeout_us))
    ).select(
        *keys,
        rebuild_ts(data, ts, epoch_us(F.col(ts)) + F.lit(timeout_us)).alias(ts),
        F.lit(0.0).alias("value"),
    )
    return ups.unionByName(downs)


def string_concatenator(
    data: DataFrame,
    control: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    text_col: str = "value",
    control_value: str = "value",
    separator: str = "",
    seq_col: str | None = None,
) -> DataFrame:
    """StringConcatenator (reference system/tasks/stringconcatenator.py:
    20-62): accumulate incoming text; on a rising edge of the control
    (≤0.5 → >0.5) flush the accumulated string as one output row at the
    control row's timestamp, then clear. Data is processed BEFORE control
    at equal timestamps (stringconcatenator.py:24-27). Text accumulated
    after the last flush is never emitted."""
    d = data.select(
        *keys,
        ts,
        F.col(text_col).cast("string").alias("__txt"),
        F.lit(None).cast("double").alias("__ctl"),
        F.lit(0).alias("__prio"),  # data first at equal ts
        *([F.col(seq_col).alias("__seq")] if seq_col else [F.lit(0).alias("__seq")]),
    )
    c = control.select(
        *keys,
        ts,
        F.lit(None).cast("string").alias("__txt"),
        F.col(control_value).cast("double").alias("__ctl"),
        F.lit(1).alias("__prio"),
        *([F.col(seq_col).alias("__seq")] if seq_col else [F.lit(0).alias("__seq")]),
    )
    u = d.unionByName(c)
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts).asc(), F.col("__prio").asc(), F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctl_state = F.coalesce(
        F.last("__ctl", ignorenulls=True).over(w), F.lit(0.0)
    )
    stated = u.withColumn("__cur", ctl_state > 0.5)
    wprev = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(ts).asc(), F.col("__prio").asc(), F.col("__seq").asc())
    )
    stated = stated.withColumn(
        "__prev_state", F.coalesce(F.lag("__cur").over(wprev), F.lit(False))
    )
    flush = (~F.col("__prev_state")) & F.col("__cur") & F.col("__ctl").isNotNull()
    # segment id: number of flushes strictly BEFORE this row
    stated = stated.withColumn("__flush", flush)
    seg = (
        F.sum(F.when(F.col("__flush"), 1).otherwise(0)).over(
            (
                Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
                    F.col(ts).asc(), F.col("__prio").asc(), F.col("__seq").asc()
                )
            ).rowsBetween(Window.unboundedPreceding, -1)
        )
    )
    stated = stated.withColumn("__seg", F.coalesce(seg, F.lit(0)))
    texts = (
        stated.filter(F.col("__txt").isNotNull())
        .groupBy(*keys, "__seg")
        .agg(
            F.concat_ws(
                separator,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ts, F.col("__seq"), F.col("__txt")))
                    ),
                    lambda s: s["__txt"],
                ),
            ).alias("value")
        )
    )
    flushes = stated.filter(F.col("__flush")).select(
        *keys, F.col(ts).alias(ts), F.col("__seg").alias("__seg")
    )
    return flushes.join(texts, [*keys, "__seg"], "inner").select(*keys, ts, "value")
