"""fn_task — the programmatic operator surface (reference fntask.py).

The reference turns a typed Python function into a task: each parameter
becomes an input stream, the return annotation the output stream(s), and
inputs are merged so the fn sees the LATEST value of every parameter at
each arrival (reference system/fntask.py:389-391 decorator, :318-358
signature inspection, :141-150 param cache, :24-35 type map).

Spark rebuild: the decorator inspects the same type hints and builds an
Arrow-batched pandas UDF —

    @fn_task
    def scaled_sum(a: float, b: float) -> float:
        return a * 2 + b          # receives pandas Series (vectorized)

    scaled_sum.column(F.col("x"), F.col("y"))      # → Column
    scaled_sum.as_stream_op(clicks, {"b": views},  # → DataFrame
                            keys=["user_id"])

Type map mirrors the reference's (fntask.py:24-35): int/float/bool →
DOUBLE (bool-as-float >0.5 convention), str → STRING, bytes → BINARY.
Tuple returns map to a struct exploded into value_0..value_{n-1}
(reference tuple-return → N output streams).

``vectorized=True`` (default) hands the fn pandas Series — the Arrow
fast path. ``vectorized=False`` is the reference-compatibility path
(scalar fn applied per row inside the Arrow batch); it exists for
porting convenience and is the documented slow path.

``as_stream_op`` reproduces the reference's input semantics: the first
parameter is the driving stream's value; every other parameter is the
latest value of the same-named control stream as of the row's event time
(last_value_join — one shuffle, state partitioned by ``keys``). Rows
where some parameter has no value yet are dropped, matching the
reference's "execute once all params present" rule (fntask.py:126-139).
"""

from __future__ import annotations

import inspect
import typing
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    DataType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from streamtasks_spark.operators.joins import last_value_join

# reference type map (fntask.py:24-35): numbers collapse to double,
# text to string, raw chunks to binary
_TYPE_MAP: dict[type, DataType] = {
    int: DoubleType(),
    float: DoubleType(),
    bool: DoubleType(),
    str: StringType(),
    bytes: BinaryType(),
}

_INJECTED = ("config", "state")  # driver-side injections, not streams


def _spark_type(py_type: type) -> DataType:
    try:
        return _TYPE_MAP[py_type]
    except KeyError:
        raise TypeError(
            f"fn_task: unsupported parameter/return type {py_type!r}; "
            f"supported: {sorted(t.__name__ for t in _TYPE_MAP)}"
        ) from None


class FnTask:
    """A typed Python fn lifted to a Spark operator. See module docs."""

    def __init__(self, fn, *, vectorized: bool = True, config: dict | None = None):
        self.fn = fn
        self.name = fn.__name__
        self.config = config or {}
        hints = typing.get_type_hints(fn)
        sig = inspect.signature(fn)
        self.params = [
            p for p in sig.parameters
            if p not in _INJECTED and p != "timestamp"
        ]
        self.wants_timestamp = "timestamp" in sig.parameters
        self.wants_config = "config" in sig.parameters
        self.wants_state = "state" in sig.parameters
        if self.wants_state and vectorized:
            # a per-call mutable state is inherently sequential
            vectorized = False
        if "return" not in hints:
            raise TypeError("fn_task requires a return annotation")
        ret = hints["return"]
        if typing.get_origin(ret) is tuple:
            self.out_types = [_spark_type(t) for t in typing.get_args(ret)]
            self.return_type: DataType = StructType(
                [
                    StructField(f"value_{i}", t)
                    for i, t in enumerate(self.out_types)
                ]
            )
            self.n_outputs = len(self.out_types)
        else:
            self.out_types = [_spark_type(ret)]
            self.return_type = self.out_types[0]
            self.n_outputs = 1
        self.in_types = [_spark_type(hints[p]) for p in self.params]

        fn_ref = fn
        n_out = self.n_outputs
        wants_cfg = self.wants_config
        cfg = self.config

        if vectorized:

            def batch(*series):
                kw = {"config": cfg} if wants_cfg else {}
                out = fn_ref(*series, **kw)
                if n_out > 1:
                    return pd.DataFrame(
                        {f"value_{i}": out[i] for i in range(n_out)}
                    )
                return out

        else:

            def batch(*series):
                kw = {"config": cfg} if wants_cfg else {}
                rows = [
                    fn_ref(*vals, **kw) for vals in zip(*series)
                ]
                if n_out > 1:
                    return pd.DataFrame(
                        {f"value_{i}": [r[i] for r in rows] for i in range(n_out)}
                    )
                return pd.Series(rows)

        self.udf = pandas_udf(batch, self.return_type)

    def __call__(self, *args, **kwargs):
        """The raw python fn stays callable (reference parity: fns remain
        unit-testable plain functions)."""
        return self.fn(*args, **kwargs)

    def column(self, *cols: Column) -> Column:
        """Apply as a column expression; args in declared parameter order
        (plus the event-time column last if the fn asks for
        ``timestamp``)."""
        if self.wants_state:
            raise TypeError(
                f"{self.name} declares `state`: use as_stateful_stream_op"
                " (state is per-key sequential, not a column expression)"
            )
        expected = len(self.params) + (1 if self.wants_timestamp else 0)
        if len(cols) != expected:
            raise ValueError(
                f"{self.name} expects {expected} columns, got {len(cols)}"
            )
        return self.udf(*cols)

    def as_stateful_stream_op(
        self,
        primary: DataFrame,
        *,
        keys: Sequence[str],
        ts: str = "ts",
        value_col: str = "value",
        seq_col: str | None = None,
    ) -> DataFrame:
        """Stateful fn execution (reference fntask.py: a ``state`` object
        persists across calls within a task instance — per stream key
        here). Rows are processed in event order per key; ``state`` is a
        dict the fn reads and mutates.

        Spark shape: the per-stream codec discipline — repartition by
        key, sort within partitions by (key, ts, seq), then ONE Arrow
        ``mapInPandas`` stage holding a state dict per key. One shuffle;
        per-partition (not per-group) Arrow overhead, which matters when
        keys are many and small."""
        if not self.wants_state:
            raise TypeError(f"{self.name} has no `state` parameter")
        id_cols = [*keys, ts] + ([seq_col] if seq_col else [])
        key_cols = list(keys)
        src = (
            primary.select(*id_cols, value_col)
            .repartition(*[F.col(k) for k in keys])
            .sortWithinPartitions(
                *key_cols, ts, *([seq_col] if seq_col else [])
            )
        )
        ddl = ", ".join(
            f"`{c}` {src.schema[c].dataType.simpleString()}" for c in id_cols
        )
        out_fields = (
            "`value` " + self.out_types[0].simpleString()
            if self.n_outputs == 1
            else ", ".join(
                f"`value_{i}` {t.simpleString()}"
                for i, t in enumerate(self.out_types)
            )
        )
        fn_ref, cfg = self.fn, self.config
        wants_cfg, wants_ts = self.wants_config, self.wants_timestamp
        n_out = self.n_outputs

        def run(batches):
            states: dict[tuple, dict] = {}  # per key, across Arrow batches
            for pdf in batches:
                vals = pdf[value_col].to_list()
                tss = pdf[ts].to_list() if wants_ts else [None] * len(vals)
                key_iter = zip(*[pdf[k].to_list() for k in key_cols])
                outs = []
                for kt, v, t in zip(key_iter, vals, tss):
                    kw = {"state": states.setdefault(kt, {})}
                    if wants_cfg:
                        kw["config"] = cfg
                    if wants_ts:
                        kw["timestamp"] = t
                    outs.append(fn_ref(v, **kw))
                out = pdf[id_cols].copy()
                if n_out == 1:
                    out["value"] = outs
                else:
                    for i in range(n_out):
                        out[f"value_{i}"] = [o[i] for o in outs]
                yield out

        return src.mapInPandas(run, f"{ddl}, {out_fields}")

    def as_stream_op(
        self,
        primary: DataFrame,
        others: dict[str, DataFrame] | None = None,
        *,
        keys: Sequence[str] = (),
        ts: str = "ts",
        value_col: str = "value",
        seq_col: str | None = None,
        control_first: bool = True,
    ) -> DataFrame:
        """Reference execution shape: first param ← ``primary``'s value;
        remaining params ← latest value of the same-named stream in
        ``others`` as of each primary row (fntask.py:141-150). Output:
        keys + ts (+ seq_col) + value [or value_0..n-1]."""
        if self.wants_state:
            # fail on the driver with direction, not in the executor with
            # an opaque Arrow TypeError from the missing state kwarg
            raise TypeError(
                f"{self.name} declares `state`: use as_stateful_stream_op"
                " (state is per-key sequential, not a vectorized op)"
            )
        others = others or {}
        rest = self.params[1:]
        missing = [p for p in rest if p not in others]
        if missing:
            raise ValueError(f"{self.name}: no input stream for params {missing}")
        joined = (
            last_value_join(
                primary,
                {p: others[p] for p in rest},
                keys=keys,
                ts=ts,
                value_col=value_col,
                control_first=control_first,
                seq_col=seq_col,
            )
            if rest
            else primary
        )
        # "execute once all params present"
        for p in rest:
            joined = joined.filter(F.col(p).isNotNull())
        in_cols = [F.col(value_col).cast(self.in_types[0])] + [
            F.col(p) for p in rest
        ]
        if self.wants_timestamp:
            in_cols.append(F.col(ts))
        result = self.udf(*in_cols)
        out_cols = [*keys, ts] + ([seq_col] if seq_col else [])
        if self.n_outputs == 1:
            return joined.select(*out_cols, result.alias("value"))
        tmp = joined.select(*out_cols, result.alias("__out"))
        return tmp.select(
            *out_cols,
            *[
                F.col(f"__out.value_{i}").alias(f"value_{i}")
                for i in range(self.n_outputs)
            ],
        )


def fn_task(fn=None, *, vectorized: bool = True, config: dict | None = None):
    """Decorator form, with or without arguments (reference
    fntask.py:389-391)."""
    if fn is not None:
        return FnTask(fn, vectorized=vectorized, config=config)

    def wrap(f):
        return FnTask(f, vectorized=vectorized, config=config)

    return wrap
