"""Temporal join primitives.

The reference's ONLY join semantic is "latest value of stream B as of event
time of a row in stream A" plus event-time ordered merge (SURVEY §2.5;
reference gate.py:70-93, switch.py:52-72, calculator.py:227-239). These two
primitives power gate, switch, calculator, formatter, scaler, repeater.

Scale notes (100 TB): both primitives are ONE shuffle on the partition
keys + a sort within partitions (window function). No range-join row
explosion, no driver collect. Skewed keys are the hazard — mitigated by
AQE skew handling and, where a key is genuinely hot, by pre-salting the
control stream (controls are small; data rows only need the latest value,
so salt-broadcast of latched control state is an optimization left to the
streaming tier).
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import epoch_us


def _warn_if_unkeyed(keys: Sequence[str], op: str) -> None:
    """keys=() produces Window.partitionBy() — every row lands on ONE task.
    Fine for unit tests; a scale-killer on real data, so warn loudly."""
    if not keys:
        warnings.warn(
            f"{op}(keys=()) uses a single-partition global window; "
            "pass the stream-identity columns as keys for distributed state",
            stacklevel=3,
        )

# priority constants: at equal event time, lower sorts first.
# Reference gate.py:52-54 — control messages processed BEFORE data at the
# same timestamp; stringconcatenator.py:24-27 — data BEFORE control.
PRIO_CONTROL_FIRST = 0
PRIO_DATA = 1
PRIO_CONTROL_LAST = 2


def last_value_join(
    data: DataFrame,
    controls: dict[str, DataFrame],
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    value_col: str = "value",
    control_first: bool = True,
    seq_col: str | None = None,
) -> DataFrame:
    """For each row of ``data``, attach the latest ``value_col`` of every
    control stream as of that row's event time, as new columns named by the
    ``controls`` dict keys.

    Implementation: tagged union + ``last(x, ignorenulls=True)`` over an
    event-time window partitioned by ``keys`` — one shuffle, sorted within
    partitions, fully JVM-side.

    ``control_first``: at equal timestamps the control row takes effect
    before the data row (gate semantics). ``seq_col``: optional
    deterministic final tie-break column present in all inputs.
    """
    _warn_if_unkeyed(keys, "last_value_join")
    data_cols = [c for c in data.columns]
    ctrl_names = list(controls)
    prio_ctrl = PRIO_CONTROL_FIRST if control_first else PRIO_CONTROL_LAST

    tagged = data.select(
        *data_cols,
        F.lit(PRIO_DATA).alias("__prio"),
        *[F.lit(None).cast("double").alias(f"__ctl_{n}") for n in ctrl_names],
    )
    for n in ctrl_names:
        cdf = controls[n]
        sel = [
            *[
                (cdf[c] if c in cdf.columns else F.lit(None).cast(data.schema[c].dataType)).alias(c)
                for c in data_cols
            ],
            F.lit(prio_ctrl).alias("__prio"),
            *[
                (cdf[value_col].cast("double") if m == n else F.lit(None).cast("double")).alias(f"__ctl_{m}")
                for m in ctrl_names
            ],
        ]
        tagged = tagged.unionByName(cdf.select(*sel))

    order = [F.col(ts).asc(), F.col("__prio").asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc_nulls_first())
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged
    for n in ctrl_names:
        out = out.withColumn(n, F.last(f"__ctl_{n}", ignorenulls=True).over(w))
    return out.filter(F.col("__prio") == PRIO_DATA).select(*data_cols, *ctrl_names)


def ordered_merge(
    streams: Sequence[DataFrame],
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    stream_col: str | None = "stream_idx",
    priorities: Sequence[int] | None = None,
    drop_late: bool = False,
    seq_col: str | None = None,
) -> DataFrame:
    """Event-time ordered union of N streams (reference Synchronizer,
    system/tasks/synchronizer.py:14-44 over client/topic.py:117-141).

    In batch, global order is realized lazily by downstream sorts; the
    semantic content here is (a) the union with a deterministic priority
    tie-break column and (b) the per-stream late-data drop rule
    (client/topic.py:127 "drop the past"): a row whose ts is smaller than a
    previous row's ts *within the same stream and keys* is discarded.
    """
    priorities = list(priorities or range(len(streams)))
    tagged = []
    for i, s in enumerate(streams):
        sel = s
        if stream_col is not None:
            sel = sel.withColumn(stream_col, F.lit(priorities[i]))
        tagged.append(sel)
    out = tagged[0]
    for s in tagged[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    if drop_late:
        # "drop the past" is defined against ARRIVAL order: a row is late iff
        # an earlier-arriving row of the same stream had a greater ts. Batch
        # has no implicit arrival order, so seq_col (an arrival sequence
        # column) is required for the rule to be meaningful.
        if seq_col is None:
            raise ValueError("ordered_merge(drop_late=True) needs seq_col")
        part = [*keys] + ([stream_col] if stream_col is not None else [])
        w = (
            Window.partitionBy(*[F.col(c) for c in part])
            .orderBy(F.col(seq_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = (
            out.withColumn("__prev_max", F.max(ts).over(w))
            .filter(F.col("__prev_max").isNull() | (F.col(ts) >= F.col("__prev_max")))
            .drop("__prev_max")
        )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str] = (),
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_right",
    allow_exact_match: bool = True,
    seq_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    with ``right_ts <= left_ts`` (or ``<`` if not allow_exact_match) within
    the same ``keys``, optionally within ``tolerance_ms``.

    ``seq_col``: optional column of the RIGHT side used as a deterministic
    tie-break among right rows sharing (keys, ts) — the highest ``seq_col``
    wins (last-arrival semantics, matching last_value_join).

    Spark has no native as-of join; the scalable pattern (SURVEY §4) is a
    tagged union + one window pass — O(n log n) per partition, one shuffle,
    instead of a range-join explosion.
    """
    _warn_if_unkeyed(keys, "asof_join")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    rstruct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c).alias(c) for c in right_cols]
    )
    rseq = (
        F.col(seq_col) if seq_col is not None and seq_col in right.columns
        else F.lit(0)
    )

    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias("__rstruct"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast("long").alias("__rseq"),
    )
    rhs = right.select(
        *[
            (F.lit(None).cast(left.schema[c].dataType)).alias(c)
            if c not in keys
            else F.col(c).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__is_left"),
        rstruct.alias("__rstruct"),
        F.col(right_ts).alias("__ts"),
        rseq.cast("long").alias("__rseq"),
    )
    union = lhs.unionByName(rhs)

    # right rows sort before left rows at equal ts iff exact match allowed;
    # among right rows with equal ts, the highest __rseq sorts last so
    # F.last picks it deterministically (left rows' null seq sorts first).
    right_prio = 0 if allow_exact_match else 2
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(
            F.col("__ts").asc(),
            F.when(F.col("__is_left") == 0, F.lit(right_prio)).otherwise(F.lit(1)).asc(),
            F.col("__rseq").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = union.withColumn("__m", F.last("__rstruct", ignorenulls=True).over(w))
    out = matched.filter(F.col("__is_left") == 1)
    if tolerance_ms is not None:
        out = out.withColumn(
            "__m",
            F.when(
                epoch_us(F.col(left_ts)) - epoch_us(F.col("__m.__rts"))
                <= F.lit(tolerance_ms * 1000),
                F.col("__m"),
            ),
        )
    result_cols = [F.col(c) for c in left.columns]
    for c in right_cols:
        name = c + (suffix if c in left.columns else "")
        result_cols.append(F.col(f"__m.{c}").alias(name))
    result_cols.append(F.col("__m.__rts").alias(f"{right_ts}{suffix}_asof"))
    return out.select(*result_cols)


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    *,
    keys: Sequence[str] = (),
    left_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_minutes: int = 10,
    max_span_buckets: int = 1000,
) -> DataFrame:
    """Inner range join: each ``left`` row pairs with every ``intervals``
    row sharing ``keys`` whose ``[start_col, end_col)`` contains the left
    row's ``left_ts``.

    OSS Spark plans a timestamp-band join condition as a nested-loop /
    cartesian per key — a scan-crushing failure mode at 100 TB. The
    scalable formulation buckets time: each interval is exploded to the
    bucket ids it covers (``F.sequence``), each left row gets its single
    bucket id, and the join becomes an EQUI-join on (keys, bucket) with
    the band predicate left as a residual filter. One shuffle per side,
    sort-merge joinable, AQE-skew-splittable. A matched pair meets in
    exactly one bucket (the left row's), so no post-join dedup is needed.

    ``bucket_minutes`` tunes the explosion factor: an interval spanning
    S minutes becomes ``ceil(S/bucket) + 1`` rows. Pick it near the
    median interval length (explosion ≈ 2×). ``max_span_buckets`` guards
    a degenerate interval (an open-ended end timestamp, or a REVERSED
    interval whose descending F.sequence would equally explode) from
    producing millions of rows — the job fails with a clear message
    instead of silently running away. Intervals with a NULL bound can
    never match the band predicate, so they are dropped up front
    (inner-join semantics), not errored.

    The streaming twin needs no custom code: Structured Streaming's
    native stream-stream interval join expresses the same semantics with
    watermarks bounding the state (tests/test_streaming.py pins the
    equivalence).
    """
    _warn_if_unkeyed(keys, "range_join")
    bucket_us = bucket_minutes * 60 * 1_000_000
    lb = F.floor(epoch_us(F.col(left_ts)) / F.lit(bucket_us))
    sb = F.floor(epoch_us(F.col(start_col)) / F.lit(bucket_us))
    eb = F.floor(epoch_us(F.col(end_col)) / F.lit(bucket_us))
    # the guard lives INSIDE the exploded expression — a standalone
    # assert_true column would be pruned away by Catalyst. The span must
    # be checked as 0 <= span < max: a reversed interval gives a
    # NEGATIVE span and F.sequence(sb, eb) would generate a DESCENDING
    # runaway array, not an error.
    span_ok = (eb >= sb) & (eb - sb < F.lit(max_span_buckets))
    guarded_seq = F.when(span_ok, F.sequence(sb, eb)).otherwise(
        F.raise_error(
            F.concat_ws(
                "",
                F.lit(
                    f"range_join: reversed interval or span >= "
                    f"{max_span_buckets} buckets of {bucket_minutes} min at "
                ),
                F.col(start_col).cast("string"),
                F.lit(".."),
                F.col(end_col).cast("string"),
            )
        )
    )
    iv = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).withColumn("__bucket", F.explode(guarded_seq))
    lhs = left.withColumn("__bucket", lb)
    return (
        lhs.join(iv, [*keys, "__bucket"])
        .filter(
            (F.col(left_ts) >= F.col(start_col))
            & (F.col(left_ts) < F.col(end_col))
        )
        .drop("__bucket")
    )
