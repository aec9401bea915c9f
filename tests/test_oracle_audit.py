"""Byte-level oracle-trap audit (scripts/check_oracle.py).

The round driver compares Spark and DuckDB results by hashing bytes, so
two traps that are value-identical still fail it: DuckDB integer
``sum()`` returns HUGEINT (pandas float64) where Spark emits int64
(burned 4 driver rows in round 3), and DuckDB ``round()`` can emit -0.0
where Spark emits +0.0 (burned 5 rows in round 2). ``audit_types`` must
catch both locally, pre-driver. These tests pin that with deliberately
broken frames — pure pandas/DuckDB, no Spark session needed.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from check_oracle import audit_types  # noqa: E402


def _duck_frame_and_types(sql: str):
    con = duckdb.connect()
    odf = con.execute(sql).df()
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    return odf, {row[0]: row[1] for row in desc}


def test_uncasted_integer_sum_is_flagged():
    # the r3 failure mode, reproduced: bare sum() of an integer
    sql = "SELECT sum(x) AS s FROM (SELECT unnest([1, 2, 3])::BIGINT AS x)"
    odf, duck_types = _duck_frame_and_types(sql)
    assert duck_types["s"] == "HUGEINT"
    assert odf["s"].dtype.kind == "f"  # pandas converts HUGEINT to float64
    sdf = pd.DataFrame({"s": pd.array([6], dtype="int64")})  # what Spark emits
    problems = audit_types(sdf, odf, duck_types)
    assert any("HUGEINT" in p for p in problems)
    assert any("dtype class differs" in p for p in problems)


def test_casted_integer_sum_is_clean():
    sql = (
        "SELECT CAST(sum(x) AS BIGINT) AS s "
        "FROM (SELECT unnest([1, 2, 3])::BIGINT AS x)"
    )
    odf, duck_types = _duck_frame_and_types(sql)
    sdf = pd.DataFrame({"s": pd.array([6], dtype="int64")})
    assert audit_types(sdf, odf, duck_types) == []


def test_negative_zero_population_mismatch_is_flagged():
    # the r2 failure mode: same values, one side carries -0.0
    sdf = pd.DataFrame({"v": [0.0, 1.5]})
    odf = pd.DataFrame({"v": [-0.0, 1.5]})
    problems = audit_types(sdf, odf, None)
    assert any("-0.0" in p for p in problems)
    # normalized (+ 0.0 on both sides) passes
    assert audit_types(sdf, sdf.copy(), None) == []


def test_int_float_kind_mismatch_is_flagged_without_duck_types():
    sdf = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    odf = pd.DataFrame({"n": [1.0, 2.0]})
    problems = audit_types(sdf, odf, None)
    assert any("dtype class differs" in p for p in problems)


def test_changed_queries_sit_inside_driver_window():
    # the driver hash-checks only the first 50 queries() entries; every
    # query whose code or oracle changed this round must be in there.
    # queries() asserts this itself — importing and calling it is the test.
    entry_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, entry_dir)
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    assert len(qs) == len(set(qs))
    window = qs[:50]
    # resolve the current round's lists by prefix so this test can't
    # silently pin a stale round after the per-round rename
    must = max(n for n in vars(entrymod) if n.startswith("_MUST_VERIFY_R"))
    rot = max(n for n in vars(entrymod) if n.startswith("_ROTATE_R"))
    missing = [n for n in getattr(entrymod, must)
               + getattr(entrymod, rot) if n not in window]
    assert missing == []
    # and every query has either an oracle or a documented rows-only path
    oracles = entrymod.oracle_sql()
    assert [q for q in qs if q not in oracles] == []


@pytest.mark.slow  # slow tier (pytest.ini, r12)
def test_oracle_manifest_blast_radius(spark):
    """Mechanized indirect-consumer detection (r07 verdict task 2): the
    committed ORACLE_MANIFEST.json maps every query to
    sha256(rendered oracle SQL + canonical analyzed plan). Editing a
    SHARED helper (norm_text, tokens_expr, _duck_dot, ...) changes the
    rendered SQL/plan of every consuming query — this test re-renders
    all 122 and fails NAMING any query that drifted from the manifest
    without being either inside the driver's 50-entry window or listed
    in the current _MUST_VERIFY_R{N}. This is the gate that would have
    caught quality_buckets in r07 (changed via text_stats -> norm_text,
    shipped displaced and mislabeled 'untouched').

    Round workflow: change code -> this test names the blast radius ->
    add the named queries to _MUST_VERIFY_R{N} (rotating them into the
    window) -> regenerate the manifest (scripts/oracle_manifest.py
    --write) and commit it with the change."""
    entry_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, entry_dir)
    import __spark_entry__ as entrymod
    from oracle_manifest import drift, load_manifest, render_manifest

    committed = load_manifest()
    current = render_manifest(spark)
    changed, added, removed = drift(current, committed)
    must = max(n for n in vars(entrymod) if n.startswith("_MUST_VERIFY_R"))
    declared = set(getattr(entrymod, must)) | set(list(entrymod.queries())[:50])
    undeclared = [n for n in changed + added if n not in declared]
    assert undeclared == [], (
        f"queries whose rendered oracle SQL or plan drifted from "
        f"ORACLE_MANIFEST.json without a {must} listing or a window "
        f"slot — rotate them in and regenerate the manifest: {undeclared}"
    )
    # a removed query is a coverage regression, never silent
    assert removed == [], f"queries removed since the manifest: {removed}"


@pytest.mark.parametrize("round_fn", ["round(sum(x), 2)"])
def test_duck_round_of_hugeint_sum_still_flagged(round_fn):
    # round() launders HUGEINT to DOUBLE — the dtype-kind check must
    # still catch it when Spark emits int64
    sql = f"SELECT {round_fn} AS s FROM (SELECT unnest([1, 2, 3])::BIGINT AS x)"
    odf, duck_types = _duck_frame_and_types(sql)
    sdf = pd.DataFrame({"s": pd.array([6], dtype="int64")})
    problems = audit_types(sdf, odf, duck_types)
    assert any("dtype class differs" in p for p in problems)
