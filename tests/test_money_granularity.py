"""Pins the 2-dp money-granularity assumption the exact-integer tier
rests on (streamtasks_spark/relational/queries.py module note).

Every cent-exactness claim in the relational tier derives from "this
column is a 2-dp decimal stored as the nearest double": only then is
floor(x*100 + 0.5) the true cent value, products of cent terms exact
BIGINTs, and the integer sums order-independent. The DuckDB oracles
mirror the same expression, so a granularity violation can NEVER
surface as a hash mismatch — both engines would agree on a silently
wrong sum. This test is the only guard: if future testdata ships >2-dp
money, it fails loudly (r05 verdict, "what's wrong" #1).

Checked with DuckDB directly (no Spark session): the invariant is a
property of the parquet files, not of either engine.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# (table, column, decimal places) — every column the exact-integer tier
# scales by 10^dp with a half-up floor. 2 dp for money; events.value is
# the cent-exact session-sum column (events_session_windows).
MONEY_COLUMNS = [
    ("lineitem", "l_extendedprice", 2),
    ("lineitem", "l_discount", 2),
    ("lineitem", "l_tax", 2),
    ("part", "p_retailprice", 2),
    ("orders", "o_totalprice", 2),
    ("customer", "c_acctbal", 2),
    ("supplier", "s_acctbal", 2),
    ("events", "value", 2),
]

# |x·10^dp − round(x·10^dp)| for a true dp-decimal stored as double is
# bounded by representation error (≲1e-9 at these magnitudes); a value
# with one extra decimal digit lands at ≥0.1 minus representation
# error. 1e-6 splits the two regimes with >4 orders of margin each way.
TOLERANCE = 1e-6


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.skipif(not SF_DIRS, reason="no testdata dirs present")
@pytest.mark.parametrize("table,column,dp", MONEY_COLUMNS)
def test_money_column_granularity(con, table, column, dp):
    scale = 10**dp
    for sf_dir in SF_DIRS:
        path = f"{sf_dir}/{table}.parquet"
        if not os.path.exists(path):
            continue
        n_bad, worst, total = con.execute(
            f"""
            SELECT
              count(*) FILTER (
                WHERE abs({column} * {scale}
                          - round({column} * {scale})) > {TOLERANCE}),
              max(abs({column} * {scale} - round({column} * {scale}))),
              count(*)
            FROM '{path}'
            WHERE {column} IS NOT NULL
            """
        ).fetchone()
        assert total > 0, f"{path} has no rows — granularity unverifiable"
        assert n_bad == 0, (
            f"{table}.{column} in {sf_dir} is NOT {dp}-dp: {n_bad}/{total} "
            f"values off-grid (worst residual {worst:.3e}). The exact-"
            f"integer money tier (relational/queries.py) and its DuckDB "
            f"oracles would both compute silently wrong sums — re-derive "
            f"the unit scale before trusting any money aggregate."
        )


@pytest.mark.skipif(not SF_DIRS, reason="no testdata dirs present")
def test_halfup_floor_recovers_cents(con):
    """The tier's floor(x*100 + 0.5) idiom must equal round(x*100) on
    the actual data — i.e. representation error never straddles the
    half-cent boundary the idiom rounds across."""
    for sf_dir in SF_DIRS:
        path = f"{sf_dir}/lineitem.parquet"
        if not os.path.exists(path):
            continue
        (n_bad,) = con.execute(
            f"""
            SELECT count(*) FILTER (
              WHERE CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    <> CAST(round(l_extendedprice * 100) AS BIGINT))
            FROM '{path}'
            """
        ).fetchone()
        assert n_bad == 0, (
            f"floor(x*100+0.5) != round(x*100) for {n_bad} rows in "
            f"{path} — the half-up idiom is unsafe on this data"
        )
