"""Calculator language: the three backends (python / pyspark / SQL-duckdb)
must agree with each other and with the reference semantics (math-module
oracle, mirroring /root/reference/tests/tasks/test_calculator.py:8-15)."""

from __future__ import annotations

import math

import duckdb
import pytest

from streamtasks_spark.functions import calculator as C

CASES = [
    ("1 + 2 * 3 - 4 / 8", {}),
    ("2 ** 3 ** 2", {}),  # left-assoc per reference grammar: 64
    ("-7 % 3", {}),  # python modulo: 2
    ("7 % -3", {}),  # python modulo: -2
    ("a + b * 2", {"a": 1.5, "b": -0.25}),
    ("a > b", {"a": 1.0, "b": 2.0}),
    ("a >= 1 & b < 0", {"a": 1.0, "b": -1.0}),
    ("a | b", {"a": 0.51, "b": 0.0}),
    ("a ^ b", {"a": 1.0, "b": 1.0}),
    ("!a", {"a": 0.49}),
    ("a == 1 ? 10 : 20", {"a": 1.0}),
    ("a != 1 ? 10 : 20", {"a": 1.0}),
    ("sin(a) + cos(b) + tan(0.5)", {"a": 0.3, "b": 0.7}),
    ("asin(0.5) + acos(0.5) + atan(2)", {}),
    ("atan2(1, 2)", {}),
    ("sinh(1) + cosh(1) + tanh(1)", {}),
    ("asinh(1) + acosh(2) + atanh(0.5)", {}),
    ("log(e) + log2(8) + log10(100)", {}),
    ("exp(1) + sqrt(16)", {}),
    ("floor(2.7) + ceil(2.1)", {}),
    ("round(2.5) + round(1.5) + round(-0.5)", {}),  # banker's rounding
    ("abs(-3.5)", {}),
    ("min(a, b, 0) + max(a, b, 10)", {"a": 3.0, "b": -4.0}),
    ("pi * e", {}),
    ("(a + b) * (a - b) / (a * a - b * b + 1e-9)", {"a": 3.0, "b": 2.0}),
    ("1 < 2 == 1", {}),  # chained comparisons left-assoc: (1<2)==1 -> 1.0
]


def test_reference_semantics_oracle():
    # the reference's own test: expression vs math module
    assert C.evaluate("sin(0.5)") == math.sin(0.5)
    assert C.evaluate("2 ** 3 ** 2") == 64.0
    assert C.evaluate("-7 % 3") == -7 % 3 == 2
    assert C.evaluate("round(0.5)") == 0.0  # python banker's rounding
    assert C.evaluate("!0.51") == 0.0 and C.evaluate("!0.5") == 1.0
    assert C.evaluate("0.51 & 1") == 1.0 and C.evaluate("0.5 & 1") == 0.0


def test_variable_extraction():
    assert C.variable_names("a + sin(b) * pi") == {"a", "b"}
    assert C.variable_names("pi + e") == set()


@pytest.mark.parametrize("expr,env", CASES, ids=[c[0] for c in CASES])
def test_sql_backend_matches_python(expr, env):
    expected = C.evaluate(expr, env)
    resolver = {k: repr(v) for k, v in env.items()}
    sql = C.compile_sql(expr, resolver)
    got = duckdb.sql(f"SELECT {sql} AS v").fetchone()[0]
    assert got == pytest.approx(expected, rel=1e-12, abs=1e-12)


def test_spark_backend_matches_python(spark):
    from pyspark.sql import functions as F

    rows = [{"a": a, "b": b} for a in (-1.0, 0.0, 0.49, 0.5, 0.51, 1.0, 2.5)
            for b in (-2.0, 0.0, 0.5, 0.75, 3.0)]
    df = spark.createDataFrame(rows)
    exprs = [
        "a + b * 2 - a / (b + 10)",
        "a > b ? a : b",
        "(a & b) | !(a ^ b)",
        "min(a, b) + max(a, b)",
        "a >= 0.5 & b < 1",
        "abs(a) ** 2 % 3",
    ]
    sel = [
        C.compile_column(e, {"a": F.col("a"), "b": F.col("b")}).alias(f"e{i}")
        for i, e in enumerate(exprs)
    ]
    out = df.select("a", "b", *sel).collect()
    for row in out:
        env = {"a": row["a"], "b": row["b"]}
        for i, e in enumerate(exprs):
            assert row[f"e{i}"] == pytest.approx(C.evaluate(e, env), rel=1e-12), (
                e, env,
            )


def test_parse_errors():
    for bad in ["1 +", "foo(1)", "(1", "a ? b", "1 2"]:
        with pytest.raises(ValueError):
            C.parse(bad) if bad != "foo(1)" else C.evaluate(bad, {})
