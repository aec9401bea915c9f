"""fn_task surface tests (reference fntask.py:318-358 semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamtasks_spark.functions.fntask import FnTask, fn_task


@fn_task
def _vec(a: float, b: float) -> float:
    return a * b + 1


@fn_task(vectorized=False)
def _scalar(a: float, b: float) -> float:
    return a * b + 1


@fn_task
def _multi(a: float) -> tuple[float, str]:
    return a * 2, a.astype(int).astype(str)


@fn_task(config={"gain": 3.0})
def _with_cfg(a: float, config: dict) -> float:
    return a * config["gain"]


def test_type_map_follows_reference():
    assert [t.simpleString() for t in _vec.in_types] == ["double", "double"]
    assert _vec.return_type.simpleString() == "double"
    assert _multi.return_type.simpleString() == "struct<value_0:double,value_1:string>"


def test_plain_callable():
    assert _vec(3.0, 4.0) == 13.0


def test_unsupported_type_rejected():
    with pytest.raises(TypeError):

        @fn_task
        def bad(a: list) -> float:  # pragma: no cover
            return 0.0


def test_missing_return_annotation_rejected():
    with pytest.raises(TypeError):
        FnTask(lambda a: a)


def test_column_modes_agree(spark):
    df = spark.range(100).select(
        (F.col("id") * 1.5).alias("x"), (F.col("id") + 2.0).alias("y")
    )
    v = df.select(_vec.column(F.col("x"), F.col("y")).alias("r")).collect()
    s = df.select(_scalar.column(F.col("x"), F.col("y")).alias("r")).collect()
    assert [r["r"] for r in v] == [r["r"] for r in s]
    assert v[3]["r"] == 4.5 * 5.0 + 1


def test_config_injection(spark):
    df = spark.range(5).select(F.col("id").cast("double").alias("x"))
    out = df.select(_with_cfg.column(F.col("x")).alias("r")).collect()
    assert [r["r"] for r in out] == [0.0, 3.0, 6.0, 9.0, 12.0]


def test_tuple_return_explodes_to_value_columns(spark):
    data = [(1, 100, 2.0), (1, 200, 5.0)]
    df = spark.createDataFrame(data, ["key", "ts", "value"])
    out = _multi.as_stream_op(df, keys=["key"], ts="ts").collect()
    got = {(r["ts"]): (r["value_0"], r["value_1"]) for r in out}
    assert got == {100: (4.0, "2"), 200: (10.0, "5")}


def test_as_stream_op_drops_rows_before_all_params_present(spark):
    prim = spark.createDataFrame(
        [(1, 100, 1.0), (1, 300, 2.0)], ["key", "ts", "value"]
    )
    other = spark.createDataFrame([(1, 200, 10.0)], ["key", "ts", "value"])
    out = _vec.as_stream_op(prim, {"b": other}, keys=["key"]).collect()
    # the ts=100 row precedes any 'b' value -> dropped (fntask.py:126-139)
    assert [(r["ts"], r["value"]) for r in out] == [(300, 21.0)]


def test_stateful_fn_rejected_by_stream_op(spark):
    """as_stream_op must fail on the driver for state-declaring fns (the
    vectorized path cannot inject state) — not with an executor-side
    Arrow TypeError."""
    from streamtasks_spark.functions.fntask import fn_task

    @fn_task
    def counter(x: float, state) -> float:
        state["n"] = state.get("n", 0) + 1
        return x + state["n"]

    df = spark.range(3).select(
        F.lit("k").alias("user_id"),
        F.current_timestamp().alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    with pytest.raises(TypeError, match="as_stateful_stream_op"):
        counter.as_stream_op(df, keys=["user_id"])
