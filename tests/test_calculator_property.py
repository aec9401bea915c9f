"""Property-based cross-backend equivalence for the calculator language:
random expression trees must evaluate identically through the pure-Python
backend (the reference-semantics oracle) and the compiled DuckDB SQL
backend (what oracle_sql() emits). The pyspark Column backend is covered
against the same Python oracle by the enumerated cases in
test_calculator.py; this file stresses the *shape* space — precedence,
associativity, boolean-as-float coercions, ternaries — that hand-picked
cases can't exhaust.

Generated operators are restricted to total functions (no /, %, **, log,
…) so every sampled tree is defined for every sampled input; the partial
operators' domain behavior is pinned by the enumerated cases instead.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from streamtasks_spark.functions import calculator as C

VARS = ("a", "b", "c")

# number literals: tame magnitudes, exact binary fractions to keep both
# engines bit-identical through + - * chains
NUMS = st.sampled_from(
    ["0", "1", "2", "0.5", "0.25", "3", "10", "1.5", "7", "100"]
)


def exprs(depth: int = 3) -> st.SearchStrategy[str]:
    base = st.one_of(NUMS, st.sampled_from(VARS))
    if depth == 0:
        return base
    sub = exprs(depth - 1)
    binop = st.sampled_from([" + ", " - ", " * ", " > ", " < ", " >= ",
                             " <= ", " == ", " != ", " & ", " | ", " ^ "])
    return st.one_of(
        base,
        st.builds(lambda l, op, r: f"({l}{op}{r})", sub, binop, sub),
        st.builds(lambda x: f"(-{x})", sub),
        st.builds(lambda x: f"(!{x})", sub),
        st.builds(lambda f, x: f"{f}({x})",
                  st.sampled_from(["abs", "floor", "ceil", "round"]), sub),
        st.builds(lambda f, l, r: f"{f}({l}, {r})",
                  st.sampled_from(["min", "max"]), sub, sub),
        st.builds(lambda c, t, f: f"({c} ? {t} : {f})", sub, sub, sub),
    )


VALUES = st.sampled_from([0.0, 0.25, 0.5, 0.51, 1.0, -1.0, 2.5, -3.0, 42.0])


@settings(max_examples=300, deadline=None)
@given(expr=exprs(), va=VALUES, vb=VALUES, vc=VALUES)
def test_python_and_duckdb_backends_agree(expr, va, vb, vc):
    env = {"a": va, "b": vb, "c": vc}
    expected = C.evaluate(expr, env)

    sql = C.compile_sql(expr, {v: v for v in VARS})
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql} FROM (SELECT "
        f"CAST({va} AS DOUBLE) AS a, CAST({vb} AS DOUBLE) AS b, "
        f"CAST({vc} AS DOUBLE) AS c)"
    ).fetchone()[0]
    con.close()

    assert got == pytest.approx(expected, rel=1e-12, abs=1e-12), (
        f"expr={expr!r} env={env} python={expected} duckdb={got}"
    )
