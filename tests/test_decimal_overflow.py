"""Pins the int64-overflow class the r06 DECIMAL(38,0) accumulator
sweep defends against (relational/queries.py module note).

A money aggregate whose per-group row count grows with SF overflows a
BIGINT accumulator around SF150 per group. What happens then depends
on `spark.sql.ansi.enabled`: under Spark 4's ANSI default (this
engine's configuration — session.py sets no override) the job DIES
mid-run with ARITHMETIC_OVERFLOW; under non-ANSI it wraps silently
while the DuckDB oracle's HUGEINT promotion stays exact, so the
engines agree at test scale and diverge quietly at cluster scale.
Either behavior is broken at 100 TB; DECIMAL(38,0) accumulation works
to 1e38. These tests hold the landscape in place: if a Spark upgrade
changes the overflow semantics or decimal sums stop being exact, the
accumulator-width policy needs re-deriving and this fails first.
"""

from __future__ import annotations

import duckdb
import pytest


def test_bigint_sum_overflow_is_fatal_or_wrapped_decimal_is_exact(spark):
    # 8e18 * 3 = 2.4e19 > int64 max (9.22e18)
    df = spark.range(3).selectExpr("8000000000000000000 AS v")
    true_sum = 3 * 8_000_000_000_000_000_000

    # the DECIMAL(38,0) accumulator the swept queries use: exact
    row = df.selectExpr(
        "sum(cast(v as decimal(38,0))) AS exact"
    ).collect()[0]
    assert int(row["exact"]) == true_sum

    # the BIGINT accumulator they replaced: broken one way or the other
    try:
        (wrapped,) = df.selectExpr("sum(v) AS s").collect()[0]
    except Exception as e:  # noqa: BLE001 — Py4J wraps the JVM error
        assert "ARITHMETIC_OVERFLOW" in str(e) or "overflow" in str(e), e
        ansi = spark.conf.get("spark.sql.ansi.enabled", "true")
        assert ansi == "true", (
            f"sum(BIGINT) raised with ansi={ansi} — unexpected semantics"
        )
    else:
        # non-ANSI path: silent modular wrap (the r06 ADVICE scenario)
        assert wrapped != true_sum, (
            "sum(BIGINT) neither raised nor wrapped — Spark overflow "
            "semantics changed; re-derive the BIGINT/DECIMAL "
            "accumulator split in relational/queries.py"
        )


def test_duckdb_oracle_side_is_exact_via_hugeint():
    # the asymmetry that makes the non-ANSI variant dangerous: the
    # oracle never wraps, so at any scale where Spark wraps the hash
    # compare would fail loudly — but only if that scale is ever run.
    # At test scale both agree, hence the preemptive decimal widening.
    con = duckdb.connect()
    (s,) = con.execute(
        "SELECT sum(v) FROM (SELECT 8000000000000000000 AS v "
        "FROM range(3))"
    ).fetchone()
    assert int(s) == 3 * 8_000_000_000_000_000_000


def test_session_ansi_posture_is_known(spark):
    """The accumulator-width policy's failure-mode analysis (docstrings
    in relational/queries.py, SCALE.md) keys off the ANSI flag; if a
    config change flips it, the docs' 'fails loudly vs wraps silently'
    claims need updating — surface that here."""
    assert spark.conf.get("spark.sql.ansi.enabled") in ("true", "false")


def test_ansi_division_null_propagates_on_empty_aggregates(spark):
    """The scalar-subquery queries (q11's threshold, q15's max, q22's
    mean) divide sums by counts from a FILTERED relation that
    adversarial data can make empty: sum over no rows is NULL while
    count is 0, so the expressions evaluate NULL div 0. Spark's ANSI
    mode null-propagates before the divide-by-zero check — the
    semantic those queries' empty-input safety rests on (verified
    green by the sparse-resample fuzz fixtures). Pin it so an ANSI
    semantics change in a Spark upgrade fails here, not mid-query."""
    row = spark.sql(
        "SELECT cast(null as decimal(38,0)) div 0 AS a, "
        "       cast(null as double) / 0 AS b, "
        "       (sum(cast(x as decimal(38,0))) + count(*) * 50) "
        "         div (count(*) * 100) AS empty_mean "
        "FROM (SELECT 1 AS x WHERE false)"
    ).collect()[0]
    assert row["a"] is None and row["b"] is None
    assert row["empty_mean"] is None
