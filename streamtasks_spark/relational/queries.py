"""Relational surface: joins / aggregations / windows / set-ops / top-k.

The reference has none of these (SURVEY §2.5, §2.7 — its only joins are
temporal); Spark provides them natively, and the engine exposes them as the
table-side vocabulary. Each function takes a dict of table-name →
DataFrame (as produced by session.load_tables) and returns a DataFrame.

Scale notes: dimension joins (region/nation/supplier/part/customer at 100 TB
fact scale) are broadcast; aggregations are partial (map-side combine) by
construction via groupBy().agg(); every filter is expressed on base columns
so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 flavor: full-scan aggregate with map-side combine; the
    classic 'does partial aggregation happen' scale probe."""
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q3 flavor: selective dimension filter → join chain → agg →
    top-k.

    Scale: only the filtered customer dimension is broadcast; orders and
    lineitem are both fact-scale, so their join must stay a shuffle join
    (AQE picks the strategy at runtime). Broadcasting the orders⋈customer
    intermediate would OOM executors at 100 TB."""
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 flavor: star join through nation/region, supplier and
    customer in the same nation.

    Scale: only nation (25 rows) and region (5 rows) are fixed-size —
    those get the broadcast hint. customer and supplier grow with scale
    factor (customer ≈ 150k×SF), so they stay shuffle-joinable and AQE
    decides at runtime. The region filter is applied BEFORE the join chain
    so the nation list shrinks regardless of Catalyst's view through the
    joins."""
    asian_nations = broadcast(
        t["nation"].join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(asian_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def q4_order_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q4 flavor (late-shipment EXISTS on available columns):
    orders from one quarter having at least one lineitem shipped after
    the order date, counted per priority.

    Scale: fact⋈fact LEFT SEMI join on the order key with the extra
    date predicate in the join condition — one shuffle per side, no
    broadcast; the quarter filter reaches the orders scan."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q10 flavor: revenue lost to returned items per customer for
    one quarter, top 20.

    Scale: nation (fixed 25 rows) is the only broadcast; customer,
    orders, and lineitem are all SF-scaled shuffle joins left to AQE.
    Deterministic top-k: ordered by (rounded revenue desc, custkey)."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q14_promo_effect(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q14 flavor: promo revenue share for one ship month.

    Scale: part is SF-scaled (200k×SF rows) — deliberately NO broadcast
    hint; the l_partkey⋈p_partkey join stays a shuffle join that AQE may
    downgrade to broadcast when the filtered month is small enough."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


def q6_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q6 flavor: pure filter+agg — predicate-pushdown probe."""
    li = t["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


def q12_priority_shipping(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q12 flavor (adapted: testdata has no l_shipmode, so the
    grouping column is l_returnflag): per return flag, how many 1996
    shipments belong to critical- vs normal-priority orders.

    Scale: lineitem⋈orders is fact⋈fact — no broadcast hint anywhere;
    the CASE aggregation is a map-side partial count after the one
    join shuffle."""
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def q18_large_volume_customers(t: dict[str, DataFrame], min_qty: float = 300.0) -> DataFrame:
    """TPC-H Q18 flavor: customers whose single orders exceed a total
    quantity threshold.

    Scale: the HAVING subquery aggregates lineitem FIRST (one shuffle on
    l_orderkey, map-side combine), and only the tiny surviving key set
    joins back — a semi-join of orders against an aggregate, never a
    three-way fact join. customer attaches last, to already-thresholded
    rows."""
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.round("total_qty", 4).alias("total_qty"),
        )
    )


def q19_disjunctive_predicates(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q19 flavor (adapted: p_container absent — bands use
    p_brand/p_size/l_quantity): revenue from three OR'd brand/size/
    quantity bands.

    Scale: the brand∈{...} ∧ size-range part of the disjunction refers
    only to part columns, so Catalyst extracts it as a pre-join filter
    on part (visible as PushedFilters on p_brand/p_size) — the join
    input shrinks before the shuffle; the mixed part⋈lineitem terms
    evaluate post-join. part is SF-scaled: no broadcast hint."""
    bands = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(bands)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def top_customers_per_nation(t: dict[str, DataFrame], k: int = 3) -> DataFrame:
    """Window top-k: rank customers by account balance within nation."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        t["customer"]
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal"), "rank")
    )


def orders_without_lineitems(t: dict[str, DataFrame]) -> DataFrame:
    """Anti join (absent from the reference; table-side vocabulary)."""
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


def customers_with_orders_semi(t: dict[str, DataFrame]) -> DataFrame:
    """Semi join + distinct count per segment."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def events_hourly_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Tumbling event-time window aggregation over the stream table —
    streaming twin is groupBy(window(ts, '1 hour')) with a watermark."""
    ev = t["events"]
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .drop("approx_users")  # approximate — excluded from exact oracle
    )


def events_session_windows(t: dict[str, DataFrame], gap_minutes: int = 30) -> DataFrame:
    """Session windows per user (gap-based) — the detector/sessionization
    semantic. Streaming twin: F.session_window(ts, gap)."""
    ev = t["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = gap_minutes * 60 * 1000 * 1000
    sess = (
        ev.withColumn("__prev", F.lag("ts").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("__prev") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def events_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Grouping-set aggregation (SURVEY §2.4: grouping sets are absent in
    the reference and come free in Spark): per (event_type, day) counts,
    sums, and exact distinct users, with ROLLUP subtotals and grand
    total. 100 TB shape: map-side partial aggregation, one shuffle on
    the expanded grouping keys; distinct-user counts add one extra
    de-dup exchange that AQE sizes."""
    ev = t["events"]
    return ev.rollup(
        F.col("event_type"), F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def events_quantiles(t: dict[str, DataFrame]) -> DataFrame:
    """Exact p50/p90/p99 of event value per type (linear interpolation,
    byte-identical to DuckDB's percentile_cont — verified empirically).

    Scale note: EXACT percentiles inherently gather each group's values
    into one aggregation buffer — fine while groups are bounded (event
    types here), wrong for 100 TB groups. The scale path is
    ``approx_percentile`` (GK sketch, mergeable map-side); a unit test
    pins the approximation against this exact query so both formulations
    stay honest."""
    ev = t["events"]
    return (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))").alias("__p"))
        .select(
            "event_type",
            (F.round(F.element_at("__p", 1), 6) + F.lit(0.0)).alias("p50"),
            (F.round(F.element_at("__p", 2), 6) + F.lit(0.0)).alias("p90"),
            (F.round(F.element_at("__p", 3), 6) + F.lit(0.0)).alias("p99"),
        )
    )


def union_intersect_except(t: dict[str, DataFrame]) -> DataFrame:
    """Set-op vocabulary probe: users who clicked AND viewed but never had
    a high-value error event."""
    ev = t["events"]
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    bad = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 49.5))
        .select("user_id")
        .distinct()
    )
    return clickers.intersect(viewers).exceptAll(bad)
