"""Stream — the engine's user-facing wrapper (SURVEY §7.1 design
stance): a DataFrame + its event-time column + its stream-identity keys,
with the operator vocabulary as fluent methods. A topic in the reference
becomes a Stream here; wiring tasks becomes method chaining:

    clicks = Stream(df, keys=["user_id"]).filter("event_type = 'click'")
    gated  = clicks.gate(purchases.threshold(25))
    held   = gated.repeat(interval_ms=1000)

Everything delegates to the functional operators (operators/*,
functions/*), so Streams and raw DataFrames interoperate freely and the
wrapper adds zero execution overhead — it only carries (ts, keys,
seq) metadata so call sites stop repeating them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Stream:
    def __init__(
        self,
        df: DataFrame,
        *,
        ts: str = "ts",
        keys: Sequence[str] = (),
        seq_col: str | None = None,
    ):
        if ts not in df.columns:
            raise ValueError(f"event-time column {ts!r} not in {df.columns}")
        self.df = df
        self.ts = ts
        self.keys = list(keys)
        self.seq_col = seq_col

    def _wrap(self, df: DataFrame, seq_col: str | None = None) -> "Stream":
        # operators may not carry the sequence column through (e.g. the
        # chunkers regroup rows); keep only metadata that still resolves
        seq = seq_col if seq_col is not None else self.seq_col
        if seq is not None and seq not in df.columns:
            seq = None
        return Stream(df, ts=self.ts, keys=self.keys, seq_col=seq)

    def _kw(self) -> dict:
        return {"keys": self.keys, "ts": self.ts, "seq_col": self.seq_col}

    # ------------------------------------------------- projections

    def filter(self, cond: str | Column) -> "Stream":
        return self._wrap(self.df.filter(cond))

    def select_value(self, expr: str | Column, name: str = "value") -> "Stream":
        col = F.expr(expr) if isinstance(expr, str) else expr
        return self._wrap(self.df.withColumn(name, col))

    def threshold(self, cutoff: float, value_col: str = "value") -> "Stream":
        """Boolean-as-float control stream (>cutoff → 1.0), the engine's
        control convention."""
        return self._wrap(
            self.df.withColumn(
                value_col,
                F.when(F.col(value_col) > cutoff, F.lit(1.0)).otherwise(F.lit(0.0)),
            )
        )

    def calculate(self, expression: str, variables: dict[str, Column]) -> "Stream":
        from streamtasks_spark.functions import calculator

        return self._wrap(
            self.df.withColumn(
                "value", calculator.compile_column(expression, variables)
            )
        )

    # ------------------------------------------------- stateful ops

    def gate(self, control: "Stream", **kw) -> "Stream":
        from streamtasks_spark.operators.stateful import gate

        return self._wrap(gate(self.df, control.df, **{**self._kw(), **kw}))

    def latest_join(self, controls: dict[str, "Stream"], **kw) -> "Stream":
        from streamtasks_spark.operators.joins import last_value_join

        return self._wrap(
            last_value_join(
                self.df,
                {n: s.df for n, s in controls.items()},
                **{**self._kw(), **kw},
            )
        )

    def with_pause(self, control: "Stream", **kw) -> "Stream":
        """Annotate rows with the latched paused state from a control
        stream (control-as-data pause propagation)."""
        from streamtasks_spark.operators.stateful import pause_state

        return self._wrap(
            pause_state(self.df, control.df, **{**self._kw(), **kw})
        )

    def latch(self, reset: "Stream", **kw) -> "Stream":
        """SR latch: self is the set stream, ``reset`` the reset stream."""
        from streamtasks_spark.operators.stateful import sr_latch

        return self._wrap(sr_latch(self.df, reset.df, **{**self._kw(), **kw}))

    def detect(self, timeout_ms: int = 1000) -> "Stream":
        """MessageDetector: presence signal with up/down transitions."""
        from streamtasks_spark.operators.stateful import message_detector

        return self._wrap(
            message_detector(
                self.df, keys=self.keys, ts=self.ts, timeout_ms=timeout_ms
            )
        )

    def concat_on(self, control: "Stream", separator: str = "", **kw) -> "Stream":
        """StringConcatenator: accumulate text, flush on the control's
        rising edge."""
        from streamtasks_spark.operators.stateful import string_concatenator

        return self._wrap(
            string_concatenator(
                self.df, control.df, separator=separator, **{**self._kw(), **kw}
            )
        )

    @staticmethod
    def switch(pairs: Sequence[tuple["Stream", "Stream"]], **kw) -> "Stream":
        """Switch / mux over (data, control) Stream pairs; routing
        metadata comes from the first data stream."""
        from streamtasks_spark.operators.stateful import switch

        first = pairs[0][0]
        params = {**first._kw(), **kw}
        return first._wrap(switch([(d.df, c.df) for d, c in pairs], **params))

    def asof_join(self, right: "Stream", **kw) -> "Stream":
        from streamtasks_spark.operators.joins import asof_join

        params = {"keys": self.keys, "seq_col": self.seq_col, **kw}
        return self._wrap(asof_join(self.df, right.df, **params))

    def merge(self, *others: "Stream", drop_late: bool = False) -> "Stream":
        from streamtasks_spark.operators.joins import ordered_merge

        return self._wrap(
            ordered_merge(
                [self.df, *[o.df for o in others]],
                keys=self.keys,
                ts=self.ts,
                drop_late=drop_late,
                seq_col=self.seq_col,
            )
        )

    # ------------------------------------------------- time ops

    def buffer(self, delay_ms: int) -> "Stream":
        from streamtasks_spark.operators.timing import time_buffer

        return self._wrap(time_buffer(self.df, ts=self.ts, delay_ms=delay_ms))

    def repeat(self, interval_ms: int, value_cols: Sequence[str] | None = None) -> "Stream":
        from streamtasks_spark.operators.timing import repeater

        return self._wrap(
            repeater(
                self.df,
                keys=self.keys,
                ts=self.ts,
                interval_ms=interval_ms,
                value_cols=value_cols,
                seq_col=self.seq_col,
            )
        )

    # ------------------------------------------------- chunk windows

    def chunk(self, chunk_size: int, **kw) -> "Stream":
        """Re-chunk a samples stream into fixed-size chunks."""
        from streamtasks_spark.operators.chunks import audio_chunker

        return self._wrap(
            audio_chunker(self.df, chunk_size=chunk_size, **{**self._kw(), **kw}),
            seq_col="chunk_id",  # the chunk stream's new sequence
        )

    def chunk_padded(self, chunk_size: int, padding: int, **kw) -> "Stream":
        """Overlapping ASR-style windows (step chunk_size, pad both sides)."""
        from streamtasks_spark.operators.chunks import padded_audio_chunker

        return self._wrap(
            padded_audio_chunker(
                self.df, chunk_size=chunk_size, padding=padding,
                **{**self._kw(), **kw},
            ),
            seq_col="chunk_id",
        )

    def smooth(self, overlap: int, **kw) -> "Stream":
        """Crossfade consecutive chunks over ``overlap`` samples."""
        from streamtasks_spark.operators.chunks import audio_smoother

        return self._wrap(
            audio_smoother(self.df, overlap=overlap, **{**self._kw(), **kw})
        )

    # ------------------------------------------------- egress

    def to_df(self) -> DataFrame:
        return self.df

    def publish(self, name: str) -> "Stream":
        from streamtasks_spark.session import named_output

        named_output(self.df, name)
        return self
