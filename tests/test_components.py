"""connected_components: alternating large-star/small-star vs a
hand-written union-find, over structured and random graphs.

The adversarial case is the long PATH: naive min-label propagation
needs diameter rounds (80 here), while the star algorithm must finish
within the O(log n) budget enforced by max_iterations."""

from __future__ import annotations

import random

import duckdb
import pytest

from streamtasks_spark.llmdata.dedup import (
    connected_components,
    oracle_connected_components_sql,
)


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min of class: path-compress to roots, root is min
    # because unions always point the larger root at the smaller one
    return {x: find(x) for x in parent}


def run(spark, pairs, max_iterations=50, max_local_edges=1_000_000):
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a long, doc_b long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            df, max_iterations=max_iterations,
            max_local_edges=max_local_edges,
        ).collect()
    }
    expect = set(union_find(pairs).items())
    assert got == expect


# max_local_edges=0 forces the distributed star loop; the default takes
# the adaptive driver union-find for bounded graphs — both must agree
# with the reference union-find on every graph shape.
@pytest.mark.parametrize("cap", [0, 1_000_000])
def test_clique_and_disjoint_components(spark, cap):
    clique = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    other = [(100, 101), (101, 102), (200, 201)]
    run(spark, clique + other, max_local_edges=cap)


@pytest.mark.parametrize("cap", [0, 1_000_000])
def test_long_path_converges_in_log_rounds(spark, cap):
    # diameter 80: label propagation would need 80 rounds; the star
    # algorithm must finish within 12
    path = [(i, i + 1) for i in range(1000, 1080)]
    run(spark, path, max_iterations=12, max_local_edges=cap)


@pytest.mark.parametrize("cap", [0, 1_000_000])
def test_reversed_and_duplicate_edges(spark, cap):
    run(spark, [(5, 3), (3, 5), (3, 1), (5, 9), (9, 1), (7, 8)],
        max_local_edges=cap)


@pytest.mark.parametrize("cap", [0, 1_000_000])
def test_random_graphs_match_union_find(spark, cap):
    rng = random.Random(42)
    nodes = list(range(500))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    run(spark, pairs, max_local_edges=cap)


def test_local_and_distributed_paths_agree_at_threshold(spark):
    """The adaptive cutover must be invisible: solve the same graph with
    the cap just below and just above the edge count."""
    rng = random.Random(11)
    pairs = list({(a, b) for a, b in (
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ) if a != b})
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    n_nodes = connected_components(df).count()  # one row per node
    lo = {
        (r["node"], r["component"])
        for r in connected_components(df, max_local_edges=1).collect()
    }
    hi = {
        (r["node"], r["component"])
        for r in connected_components(df, max_local_edges=10**6).collect()
    }
    assert lo == hi == set(union_find(pairs).items())
    assert n_nodes == len(lo)


def test_oracle_cte_matches_union_find():
    rng = random.Random(7)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    con = duckdb.connect()
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    sql = oracle_connected_components_sql(
        f"SELECT * FROM (VALUES {values}) AS t(doc_a, doc_b)"
    )
    got = {(int(n), int(c)) for n, c in con.execute(sql).fetchall()}
    assert got == set(union_find(pairs).items())


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).collect() == []


def test_dedup_retention_keeps_one_per_class(spark):
    from streamtasks_spark.llmdata.dedup import dedup_retention

    docs = spark.createDataFrame(
        [(i, "web" if i < 6 else "books") for i in range(10)],
        "doc_id long, source string",
    )
    # classes: {0,1,2} (web), {6,7} (books); 3-5, 8-9 unique
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (6, 6), (7, 6)], "node long, component long"
    )
    got = {
        r["source"]: (r["n_docs"], r["n_dup_members"], r["n_kept"])
        for r in dedup_retention(docs, comp).collect()
    }
    # web: 6 docs, 3 in a class, keep 0 + 3 uniques = 4
    # books: 4 docs, 2 in a class, keep 6 + 2 uniques = 3
    assert got == {"web": (6, 3, 4), "books": (4, 2, 3)}


def test_events_funnel_orders_stages_strictly(spark):
    """Funnel must require strict ts ordering view < click < purchase —
    a purchase BEFORE the first qualifying click must not count."""
    from datetime import datetime

    from streamtasks_spark.relational.queries import events_funnel

    def ev(uid, typ, sec):
        return (uid, datetime(2024, 1, 1, 0, 0, sec), uid, typ, 1.0, "{}")

    rows = [
        # u1: full ordered funnel
        ev(1, "view", 1), ev(1, "click", 2), ev(1, "purchase", 3),
        # u2: click before view -> no qualified click
        ev(2, "click", 1), ev(2, "view", 2), ev(2, "purchase", 3),
        # u3: click qualifies (after view) but purchase precedes it
        ev(3, "view", 1), ev(3, "purchase", 2), ev(3, "click", 3),
        # u4: view only
        ev(4, "view", 1),
        # u5: no view at all
        ev(5, "purchase", 1),
        # u6: second click qualifies even though first is too early
        ev(6, "click", 1), ev(6, "view", 2), ev(6, "click", 3),
        ev(6, "purchase", 4),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    out = events_funnel({"events": df}).collect()[0]
    assert out["n_viewed"] == 5          # u1 u2 u3 u4 u6
    assert out["n_clicked_after_view"] == 3   # u1 u6, and u3's late click
    assert out["n_purchased_after_click"] == 2  # u1 u6


def test_events_retention_cohorts_week_offsets(spark):
    from datetime import datetime

    from streamtasks_spark.relational.queries import events_retention_cohorts

    def ev(i, uid, dt):
        return (i, dt, uid, "view", 1.0, "{}")

    # Mon 2024-01-01 starts week 0; 2024-01-08 week 1; 2024-01-15 week 2
    rows = [
        ev(1, 1, datetime(2024, 1, 2)),   # u1 cohort w0
        ev(2, 1, datetime(2024, 1, 9)),   # u1 active w1
        ev(3, 1, datetime(2024, 1, 16)),  # u1 active w2
        ev(4, 2, datetime(2024, 1, 3)),   # u2 cohort w0
        ev(5, 2, datetime(2024, 1, 17)),  # u2 active w2 (skipped w1)
        ev(6, 3, datetime(2024, 1, 10)),  # u3 cohort w1
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )
    out = {
        (str(r["cohort_week"].date()), r["week_offset"]): r["n_active_users"]
        for r in events_retention_cohorts({"events": df}).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,  # u1 u2 first week
        ("2024-01-01", 1): 1,  # u1 returns
        ("2024-01-01", 2): 2,  # u1 u2 return
        ("2024-01-08", 0): 1,  # u3 cohort
    }
