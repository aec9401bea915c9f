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

from streamtasks_spark.core.timeutil import epoch_us
from pyspark.sql.functions import broadcast

# Exact integer money units. Every money column in the testdata is a
# 2-dp value (pinned by tests/test_money_granularity.py across all
# SFs), so cent-scaled terms are exact BIGINTs, their products are
# exact, and integer sums are order-independent — where a double sum
# accumulates in partition order and its drift reaches rounding
# boundaries and threshold compares at SF scale (the r05 q2 fuzz
# finding's class).
#
# ACCUMULATOR WIDTH is chosen per group-growth class:
#   * groups whose row count is CONSTANT w.r.t. SF (per-order ≤7
#     lineitems, per-part ~30, per-supplier ~600, per-customer ~70 —
#     TPC-H scales entity counts, not rows per entity) keep BIGINT
#     sums: worst-case per-group magnitude ≤ ~600·1.3e11 ≈ 8e13,
#     5 orders below the int64 edge at ANY SF.
#   * groups that GROW with SF (global / per-nation / per-year /
#     per-hour aggregates) accumulate as DECIMAL(38,0): a BIGINT sum
#     of 1e-6-unit terms overflows near SF150 per group, far inside
#     the 100 TB envelope — under this engine's Spark 4 ANSI default
#     the job dies mid-run with ARITHMETIC_OVERFLOW; under non-ANSI it
#     wraps silently while the oracle stays right. Either way broken;
#     DECIMAL(38,0) raises the ceiling to 1e38 (~SF1e28). Both
#     behaviors + the decimal exactness are pinned by
#     tests/test_decimal_overflow.py. The DuckDB oracles need no
#     mirror: DuckDB promotes sum(BIGINT) to HUGEINT (int128)
#     natively, so both engines are exact and values stay identical.
#   * a third class grows with SF but sums VALUE-scale terms, not
#     lineitem-product units: q22's per-cntrycode acctbal-cent mean
#     (≤1e6/row → int64 edge at ~9e12 rows per group, ≥10³× headroom
#     at the 100 TB envelope where customer ≈ 1.5e10 rows) and
#     events_session_windows' gap-bounded per-session cent sums.
#     These keep BIGINT; re-audit if the envelope ever exceeds
#     ~SF1e6, and note ANSI makes an audit miss fail loudly, not
#     silently.
_CENT_PRICE = "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
_CENT_DISC = "cast(floor(l_discount * 100 + 0.5) as bigint)"
_REV_UNITS = f"{_CENT_PRICE} * (100 - {_CENT_DISC})"  # 1e-4 currency units
# the same per-row term, widened for SF-growing groups: the BIGINT
# product is exact per row; the cast widens only the accumulator
_REV_UNITS_DEC = f"cast({_REV_UNITS} as decimal(38,0))"


def _rev_sum_4dp():
    """Σ price·(1−discount) via exact integer units — the sum is
    4-dp-exact by construction, so no round() is needed. BIGINT
    accumulator: callers must have SF-constant group sizes (see the
    module note above)."""
    return F.sum(F.expr(_REV_UNITS)).cast("double") / 10000.0


def _rev_sum_4dp_dec():
    """Like _rev_sum_4dp, but with a DECIMAL(38,0) accumulator for
    groups whose row count grows with SF (global / per-nation /
    per-year): the BIGINT variant overflows near SF150 per group —
    fatal under the engine's ANSI default, a silent wrap without
    (r06 ADVICE finding; pinned by tests/test_decimal_overflow.py)."""
    return F.sum(F.expr(_REV_UNITS_DEC)).cast("double") / 10000.0


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 flavor: full-scan aggregate with map-side combine; the
    classic 'does partial aggregation happen' scale probe."""
    li = t["lineitem"]
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # All money sums/means accumulate in EXACT integer units
            # (price/discount/tax are 2-dp values: cents_p,
            # 100-cents_d, 100+cents_t are exact integers, so the
            # disc-price/charge products are exact in 1e-4 / 1e-6
            # units and the sums are order-independent). A double
            # sum's partition-order drift at SF-scale reaches the
            # 4-dp rounding unit — the r05 q2 fuzz finding's class,
            # preempted here. q1's groups span the WHOLE table (~4
            # groups), so every accumulator is DECIMAL(38,0): a
            # BIGINT sum of the 1e-6-unit charge terms overflows
            # near SF150 (r06 ADVICE finding; fatal under ANSI,
            # silent wrap without). The per-row products
            # stay BIGINT (exact, ≤1.3e11); only the accumulator
            # widens. DuckDB's sum(BIGINT)→HUGEINT is already exact.
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            (
                F.sum(F.expr(
                    "cast(cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
                    " as decimal(38,0))"
                )).cast("double") / 100.0
            ).alias("sum_base_price"),
            (
                F.sum(F.expr(
                    "cast(cast(floor(l_extendedprice * 100 + 0.5) as bigint) * "
                    "(100 - cast(floor(l_discount * 100 + 0.5) as bigint))"
                    " as decimal(38,0))"
                )).cast("double") / 10000.0
            ).alias("sum_disc_price"),
            (
                # no half-up div-100 here: that quotient is itself in
                # 1e-4 units and outgrows int64 near SF1e5 — cast the
                # exact decimal sum straight to double (identical
                # round-to-nearest on both engines)
                F.sum(F.expr(
                    "cast(cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
                    " * (100 - cast(floor(l_discount * 100 + 0.5) as bigint))"
                    " * (100 + cast(floor(l_tax * 100 + 0.5) as bigint))"
                    " as decimal(38,0))"
                )).cast("double") / 1000000.0
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            (
                # div quotient is a per-row-scale mean (~1e8 in 1e-4
                # units) — always inside int64; only the dividend sum
                # needed widening
                F.expr(
                    "(sum(cast(cast(floor(l_extendedprice * 1000000 + 0.5) "
                    "as bigint) as decimal(38,0))) + count(*) * 50) "
                    "div (count(*) * 100)"
                ).cast("double") / 10000.0
            ).alias("avg_price"),
            (
                F.expr(
                    "(sum(cast(cast(floor(l_discount * 1000000 + 0.5) "
                    "as bigint) as decimal(38,0))) + count(*) * 50) "
                    "div (count(*) * 100)"
                ).cast("double") / 10000.0
            ).alias("avg_disc"),
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
            _rev_sum_4dp().alias("revenue")
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
            _rev_sum_4dp_dec().alias("revenue")
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
            _rev_sum_4dp().alias("revenue")
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
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # exact-unit sums; one deterministic division. One global
            # group (the ship month grows with SF) → DECIMAL(38,0)
            # accumulators on both sums (module note)
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(
                        F.col("p_type") == "PROMO", F.expr(_REV_UNITS)
                    ).otherwise(F.lit(0).cast("bigint"))
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.sum(F.expr(_REV_UNITS_DEC)).cast("double"),
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
        # price·discount in exact 1e-4 units (both are 2-dp values);
        # GLOBAL group → DECIMAL(38,0) accumulator (module note)
        (
            F.sum(
                F.expr(f"cast({_CENT_PRICE} * {_CENT_DISC} as decimal(38,0))")
            ).cast("double")
            / 10000.0
        ).alias("revenue")
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
            _rev_sum_4dp_dec().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q2_min_cost_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q2 flavor (adapted: no partsupp table — the part⋈supplier
    relation is derived from lineitem, unit cost = avg sell price per
    unit): for each size-15 part available from EUROPE suppliers, the
    supplier(s) offering the minimum unit cost.

    Scale: the selective part filter (p_size = 15, ~1/50) semi-prunes
    lineitem BEFORE the per-(part, supplier) aggregation — per-part min
    commutes with a filter on the part key, so the result is identical
    while the aggregation input shrinks ~50×. The correlated-min
    subquery then becomes agg → min-per-part → join-back-on-min, both
    aggregations partial (map-side combine); the join back is agg⋈agg
    on (partkey, cost) — part-count-scaled, stays a shuffle join.
    nation/region are fixed-size broadcasts; supplier and part are
    SF-scaled (10k×SF / 200k×SF in TPC-H) so NO broadcast hint — AQE
    may downgrade the filtered subsets at runtime. The min is taken on
    the ROUNDED cost so the equality join-back is byte-stable.

    The unit-cost mean accumulates in integer MICRO-units: each
    l_extendedprice/l_quantity division is IEEE-deterministic (bit-
    identical in any engine), but a double avg() sums in partition
    order, and when the mean drifts within an ulp of a 0.00005
    rounding boundary the engines' round(.., 4) split (r05 fuzz
    finding, mutated-TPC-H seed 3527 — same class as the r04
    events_hourly_stats fix). floor(x*1e6 + 0.5) per row, exact
    BIGINT sum, then half-up integer rounding to 4 dp."""
    sized_parts = t["part"].filter(F.col("p_size") == 15)
    eur_supp = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        t["lineitem"]
        .join(
            sized_parts.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            (
                F.expr(
                    "(sum(cast(floor(l_extendedprice / l_quantity "
                    "* 1000000 + 0.5) as bigint)) + count(*) * 50) "
                    "div (count(*) * 100)"
                ).cast("double")
                / 10000.0
            ).alias("unit_cost")
        )
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("unit_cost").alias("__min_cost")
    )
    return (
        cost.join(
            min_cost,
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("unit_cost") == F.col("__min_cost")),
        )
        .join(sized_parts, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 4).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "unit_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q7_volume_shipping(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q7 flavor: shipping volume between two nations (either
    direction) by year.

    Scale: nation (fixed 25 rows) broadcast twice under distinct aliases
    — one per side of the trade; lineitem⋈orders⋈customer and the
    supplier attach are SF-scaled shuffle joins. The two-nation
    disjunction evaluates after both broadcasts, on already-joined rows."""
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            _rev_sum_4dp_dec().alias("revenue")
        )
    )


def q8_market_share(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q8 flavor: NATION_3's share of ECONOMY-part revenue sold to
    ASIA customers, by order year.

    Scale: the share is a conditional-sum / sum on ONE aggregation pass
    (no self-join of the revenue relation); nation×2 and region are
    broadcast, part carries the selective p_type filter into its scan,
    all fact joins stay shuffles."""
    asia_cust = (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    return (
        t["lineitem"]
        .join(t["part"].filter(F.col("p_type") == "ECONOMY"),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # both sums in exact integer units; the single division of
            # two exact integer-derived doubles is deterministic.
            # per-year groups grow with SF → DECIMAL(38,0) accumulators
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3",
                        F.expr(_REV_UNITS),
                    ).otherwise(F.lit(0).cast("bigint"))
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.sum(F.expr(_REV_UNITS_DEC)).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


def q9_product_profit(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q9 flavor (adapted: no partsupp — supply cost is modeled as
    60% of p_retailprice per unit): profit on 'red' parts by supplier
    nation and order year.

    Scale: part's name filter prunes its scan before the fact join;
    nation broadcast; profit can legitimately sum to ±0 per group so
    the result is zero-normalized (+0.0) on both engines. Profit in
    exact 1e-4 units: 0.6·retail·qty = 60·retail_cents·qty such units
    (retail is 2-dp, qty integer-valued), so the whole term is an
    exact BIGINT per row."""
    profit = F.expr(
        f"{_REV_UNITS} - 60 * cast(floor(p_retailprice * 100 + 0.5) "
        "as bigint) * cast(l_quantity as bigint)"
    )
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").contains("red")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            # per-(nation, year) groups grow with SF → DECIMAL(38,0)
            # accumulator; the signed per-row term stays exact BIGINT
            (
                F.sum(profit.cast("decimal(38,0)")).cast("double") / 10000.0
                + F.lit(0.0)
            ).alias("sum_profit")
        )
    )


def q11_important_stock(t: dict[str, DataFrame], fraction: float = 0.001) -> DataFrame:
    """TPC-H Q11 flavor (adapted: no partsupp — per-part 'inventory
    value' is the discounted revenue shipped by EUROPE suppliers): parts
    whose value exceeds ``fraction`` of the total such value.

    Scale: the scalar HAVING subquery is a second aggregation OVER THE
    ALREADY-AGGREGATED per-part relation (never a second fact scan),
    broadcast back as a one-row cross join."""
    eur_supp = (
        t["supplier"]
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    # per-part value and the HAVING threshold both in exact integer
    # units, so the > membership test is PURE INTEGER comparison
    # (fraction=0.001 → __v * 1000 > __total) — a double-sum drift on
    # either side could otherwise flip parts sitting at the threshold.
    # __v keeps a BIGINT accumulator (≈30 lineitems per part at any
    # SF, module note); __total sums __v over the SF-growing part set
    # and therefore widens to DECIMAL(38,0), as does __v's side of the
    # threshold compare so both operands stay exact
    per_part = (
        t["lineitem"]
        .join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_REV_UNITS)).alias("__v"))
    )
    total = per_part.agg(
        F.sum(F.col("__v").cast("decimal(38,0)")).alias("__total")
    )
    inv_frac = round(1.0 / fraction)
    if abs(inv_frac * fraction - 1.0) >= 1e-12:
        # not an assert: stripped under python -O, and a silently
        # wrong inv_frac (e.g. 333 for fraction=0.003) would compute a
        # wrong threshold with no error (r06 ADVICE finding)
        raise ValueError(
            "fraction must be a reciprocal integer (1/N) for the exact "
            f"integer threshold compare; got {fraction!r}"
        )
    return (
        per_part.crossJoin(broadcast(total))
        .filter(
            F.col("__v").cast("decimal(38,0)") * F.lit(inv_frac)
            > F.col("__total")
        )
        .select(
            "l_partkey",
            (F.col("__v").cast("double") / 10000.0).alias("part_value"),
        )
    )


def q13_customer_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q13 flavor (adapted: the order-exclusion predicate is a
    priority class instead of the comment LIKE): distribution of
    customers by order count, including zero-order customers.

    Scale: customer LEFT OUTER orders must stay a shuffle join at
    SF-scale (both sides grow); the double aggregation (per-customer
    count, then count-of-counts) is two cheap shuffles on shrinking
    data. Counting o_orderkey (not *) makes NULL-extended rows count 0."""
    orders = t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    return (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q15_top_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q15 flavor: supplier(s) with the maximum revenue in one
    quarter.

    Scale: per-supplier revenue is one partial agg; the scalar max is an
    agg over that (supplier-count-sized) relation broadcast back as a
    one-row cross join — the classic view + scalar-subquery plan without
    rescanning lineitem. Supplier attaches after thresholding, to ≥1
    surviving rows."""
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        # exact units: the max-equality join-back compares doubles
        # derived from integers, so drift can't split the max set
        .agg(_rev_sum_4dp().alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("__max"))
    return (
        rev.crossJoin(broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_parts_supplier_relationship(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q16 flavor (adapted: the part⋈supplier relation comes from
    lineitem; 'complaint' suppliers are those with negative balance):
    distinct supplier counts per (brand, type, size) for selected sizes,
    excluding one brand, one type, and complaint suppliers.

    Scale: the exclusion is an ANTI join against the (tiny, filtered)
    complaint-supplier side — broadcastable; the distinct-count shuffles
    once on the grouping keys after a dedup of (part, supplier) pairs."""
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_quantity_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q17 flavor: average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) for one brand were
    not taken.

    Scale: the correlated AVG subquery becomes a per-part aggregate of
    lineitem joined back on l_partkey — agg⋈fact on the part key stays a
    shuffle join (the agg side is part-count-scaled, too big to
    broadcast at 100 TB); the brand filter prunes part's scan and
    semi-shrinks both sides."""
    brand_parts = t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = t["lineitem"].join(
        brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__qty_limit")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_limit"))
        .agg(
            # exact cent sum, then ONE deterministic division by 700
            (
                F.round(
                    F.sum(F.expr(_CENT_PRICE)).cast("double") / 700.0, 4
                )
                + F.lit(0.0)
            ).alias("avg_yearly")
        )
    )


def q20_potential_promotion(t: dict[str, DataFrame], min_qty: float = 100.0) -> DataFrame:
    """TPC-H Q20 flavor (adapted: no partsupp availqty — the threshold
    is an absolute shipped-quantity floor): ASIA suppliers who shipped
    more than ``min_qty`` units of 'blue' parts during 1996.

    Scale: nested subqueries become a semi-join chain — lineitem is
    semi-filtered by the part subquery BEFORE its aggregation shuffle,
    the qualifying supplier keys are an agg output joined semi against
    supplier, and nation/region broadcast. No fact table is scanned
    twice."""
    blue_parts = t["part"].filter(F.col("p_name").contains("blue")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(blue_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > min_qty)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
    )


def q21_waiting_supplier(t: dict[str, DataFrame], late_days: int = 60) -> DataFrame:
    """TPC-H Q21 flavor (adapted: no commit/receipt dates — 'late' means
    shipped more than ``late_days`` after the order date): suppliers who
    were the ONLY late supplier on a finished multi-supplier order.

    Scale: the EXISTS/NOT-EXISTS pair is a LEFT SEMI then LEFT ANTI
    self-join of lineitem on l_orderkey with a supplier-inequality
    residual — two shuffles on the same key (co-partitioned after the
    first exchange); supplier and nation broadcast onto the surviving
    (small) row set. The orders status filter rides into the fact join."""
    li = t["lineitem"].join(
        t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = li.filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), late_days)
    ).select("l_orderkey", "l_suppkey")
    others = t["lineitem"].select(
        F.col("l_orderkey").alias("o2_okey"), F.col("l_suppkey").alias("o2_skey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("l3_okey"), F.col("l_suppkey").alias("l3_skey")
    )
    blamed = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_okey"))
            & (F.col("l_suppkey") != F.col("o2_skey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("l3_okey"))
            & (F.col("l_suppkey") != F.col("l3_skey")),
            "left_anti",
        )
    )
    return (
        blamed.join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


def q22_global_sales_opportunity(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q22 flavor (adapted: nation-key grouping instead of phone
    prefixes): well-funded customers in four nations with no orders in
    the last two data years (the reference workload's 'lapsed customer'
    semantics — every customer has SOME order at this scale).

    Scale: the scalar AVG subquery aggregates the filtered customer
    relation and broadcasts one row back; the NOT EXISTS is a LEFT ANTI
    against date-filtered orders — at SF-scale a shuffle anti-join on
    c_custkey, left to AQE, with the date filter pushed to the orders
    scan. No per-row subquery execution anywhere."""
    nations = [1, 3, 5, 7]
    cust = t["customer"].filter(F.col("c_nationkey").isin(nations))
    # threshold mean in exact integer cents (acctbal is a 2-dp value):
    # a double avg() drifts with partition order, and a customer whose
    # balance sits within an ulp of the mean would flip the strict >
    # membership between engines — same class as the r05 q2 finding
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(
                F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")
            ).cast("double")
            / (F.count(F.lit(1)) * 100.0)
        ).alias("__avg_bal")
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    return (
        cust.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (
                F.sum(
                    F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")
                ).cast("double")
                / 100.0
            ).alias("totacctbal"),
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
    streaming twin is groupBy(window(ts, '1 hour')) with a watermark.

    Values quantize to integer micro-units before aggregation: a
    cumulative DOUBLE sum differs at ulp level between engines (and
    between partial-aggregation orders), and dividing it for the avg
    lands those ulps on uniform round() boundaries — observed as
    3/3600 avg_value mismatches at sf0.1. Integer sums are exact and
    order-free; the one division afterwards is the same IEEE op on
    identical inputs in both engines."""
    ev = t["events"]
    q = F.expr("cast(floor(value * 1000000) as bigint)")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(q.cast("decimal(38,0)")).alias("__s"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            "hour",
            "event_type",
            "n_events",
            # exact integer half-up rounding to 1e-4 units, THEN one
            # double conversion — engine round(double, n) implementations
            # disagree at representability boundaries (Spark rounds the
            # exact decimal expansion via BigDecimal, DuckDB multiplies
            # and std::rounds), so never round a computed double
            F.expr(
                "cast((__s + 50) div 100 as double) / 10000.0"
            ).alias("sum_value"),
            F.expr(
                "cast((__s + n_events * 50) div (n_events * 100) as double)"
                " / 10000.0"
            ).alias("avg_value"),
        )
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
                | (epoch_us("ts") - epoch_us("__prev") > gap_us),
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
        # value is a 2-dp column: exact cent sum, order-independent
        (
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
            .cast("double")
            / 100.0
        ).alias("sum_value"),
    )


def events_sliding_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Sliding event-time windows (2-hour width, 1-hour slide) per event
    type — the third canonical window shape beside tumbling and session.
    Each event lands in exactly width/slide = 2 windows; Spark expands
    that assignment JVM-side inside the grouping (no explicit explode).
    Streaming twin: streaming/windows.py streaming_sliding_stats."""
    ev = t["events"]
    # integer micro-unit sums: see events_hourly_stats (ulp-exact across
    # engines and aggregation orders)
    q = F.expr("cast(floor(value * 1000000) as bigint)")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "2 hours", "1 hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(q.cast("decimal(38,0)")).alias("__s"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            F.expr(
                "cast((__s + 50) div 100 as double) / 10000.0"
            ).alias("sum_value"),
        )
    )


def events_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Grouping-set aggregation (SURVEY §2.4: grouping sets are absent in
    the reference and come free in Spark): per (event_type, day) counts,
    sums, and exact distinct users, with ROLLUP subtotals and grand
    total. 100 TB shape: map-side partial aggregation, one shuffle on
    the expanded grouping keys; distinct-user counts add one extra
    de-dup exchange that AQE sizes."""
    ev = t["events"]
    # integer micro-unit sums: see events_hourly_stats — the rollup's
    # grand-total row sums EVERY event, where double-order ulp drift is
    # largest
    q = F.expr("cast(floor(value * 1000000) as bigint)")
    return (
        ev.rollup(F.col("event_type"), F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q.cast("decimal(38,0)")).alias("__s"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            "event_type",
            "day",
            "n",
            F.expr(
                "cast((__s + 50) div 100 as double) / 10000.0"
            ).alias("sum_value"),
            "n_users",
        )
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


def events_json_extract(t: dict[str, DataFrame]) -> DataFrame:
    """Semi-structured column handling: extract a JSON path from the
    events ``props`` payload (``{"k": <int>}``) and aggregate on it.

    The contract: k counts only when the EXTRACTED token is
    integer-shaped with ≤ 18 digits — both engines strip quotes during
    extraction, so a quoted digit string ``{"k": "12"}`` counts as 12
    (deliberate; documented, since the regex runs on the unquoted
    text). A bare ``cast(... as long)`` fails this two ways on real
    heterogeneous props (r07 probe): under Spark's ANSI default,
    ``{"k": 3.5}`` or ``{"k": "x"}`` KILLS the whole job mid-scan
    (CAST_INVALID_INPUT), while DuckDB's JSON cast coerces 3.5 → 3 —
    a crash on one side and a silent divergence on the other. Raw
    extraction itself agrees cross-engine on every probed shape
    (numbers, quoted strings, bools, arrays, objects, missing keys,
    JSON null → NULL), so one shared regex pins the semantics.

    Regex anatomy (r07 review findings): the end anchor is ``\\z``
    (end of INPUT) because Java's ``$`` matches before a trailing
    newline where RE2's does not — ``{"k": "12\\n"}`` would count 12
    in Spark and drop in DuckDB under a ``$`` anchor; and the digit
    count is bounded at 18 because an unbounded ``[0-9]+`` lets a
    valid 20-digit JSON integer through to the ANSI cast, which is
    the exact job-killing crash the gate exists to prevent (18 digits
    ≤ 999_999_999_999_999_999 always fits int64).

    Scale shape: ``get_json_object`` is a JVM-side codegen'd expression —
    the extraction is a narrow map over the scan (no UDF), and the
    aggregate is one map-side-combined shuffle on low-cardinality keys.
    ReadSchema prunes to (event_type, props)."""
    ev = t["events"]
    s = F.get_json_object("props", "$.k")
    k = F.when(s.rlike(r"^-?[0-9]{1,18}\z"), s.cast("long"))
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
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


def events_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user, the
    first view, the first click strictly AFTER that view, the first
    purchase strictly after that click; reported as stage survivor
    counts (one summary row).

    Shape: ONE scan, ONE shuffle on user_id, then three chained
    conditional-min window passes over the same partitioning (no
    re-exchange — each stage's min(when(...)) references the previous
    stage's column) and a partitioning-aligned per-user collapse. No
    per-user arrays anywhere: WindowExec buffers each user's rows in a
    spillable ExternalAppendOnlyUnsafeRowArray, so a single user with
    unbounded activity costs disk, not executor memory — unlike a
    collect_list (ObjectHashAggregate), which must hold the whole
    per-user array on-heap and cannot spill mid-group. Measured at
    sf0.1: 0.11 s warm vs 1.75 s for the 3-scan staged-aggregate
    alternative and 0.72 s for the r04 collect_list version.
    Pinned: tests/test_plans.py asserts no collect_list /
    ObjectHashAggregate appears in this plan."""
    ev = (
        t["events"]
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    d = ev.withColumn(
        "__t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    d = d.withColumn(
        "__t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("__t1")),
                F.col("ts"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "__t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("__t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    # constant within each user partition; the groupBy rides the
    # window's exchange (hash(user_id) already satisfies it)
    per_user = d.groupBy("user_id").agg(
        F.max("__t1").alias("__t1"),
        F.max("__t2").alias("__t2"),
        F.max("__t3").alias("__t3"),
    )
    return per_user.agg(
        F.count("__t1").alias("n_viewed"),
        F.count("__t2").alias("n_clicked_after_view"),
        F.count("__t3").alias("n_purchased_after_click"),
    )


def events_retention_cohorts(t: dict[str, DataFrame]) -> DataFrame:
    """Weekly retention cohorts: users grouped by the week of their
    FIRST event; for every later week in which a cohort member is
    active, the distinct active-user count.

    Shape: per-user first-event aggregate (shuffle 1 on user_id), join
    back to the fact on user_id (co-partitioned by the same key — AQE
    plans it off the first shuffle's output), then one bounded-key
    aggregate on (cohort_week, week_offset). The week offset is
    integer-exact day arithmetic on week-truncated dates — no
    engine-specific week numbering."""
    ev = t["events"]
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("__cw")
    )
    joined = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("__aw")
    ).join(first, "user_id")
    return (
        joined.groupBy(
            # stays a (week-truncated) TIMESTAMP: Spark DATE surfaces as
            # python-object cells in pandas while DuckDB DATE arrives
            # as datetime64 — a byte-hash trap the local audit flags
            F.col("__cw").alias("cohort_week"),
            (
                F.datediff(F.col("__aw").cast("date"),
                           F.col("__cw").cast("date")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def events_anomaly(t: dict[str, DataFrame]) -> DataFrame:
    """Per-type z-score anomaly summary with CROSS-ENGINE-EXACT moment
    arithmetic: values quantize to integer 1e-4 units (floor(v*1e4+0.5)
    — floor-based so both engines round identically, unlike their
    round() half-rules), the two moments accumulate as exact integer
    sums (order-independent, no float-summation ulp drift), and mean/
    std/z derive from those exact integers through an identical double
    expression on both engines.

    Shape: one map-side-combined shuffle onto event types for the
    moments, stats broadcast back onto the scan, one bounded-key
    aggregate. Both moments accumulate as DECIMAL(38,0) (sum of q²
    reaches int64 range near ~10⁹ rows at this value domain — the r06
    sweep), and the q² PRODUCT is widened before multiplying: q ≥
    ~3.04e9 (value ≥ ~304k) would overflow the int64 multiply per row
    under ANSI before any accumulator saw it. DuckDB mirrors via
    HUGEINT. The plan shape is unchanged."""
    ev = t["events"]
    q = F.expr("cast(floor(value * 10000 + 0.5) as bigint)")
    base = ev.select("event_type", q.alias("__q"))
    stats = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__q").cast("decimal(38,0)")).alias("__s"),
        F.sum(F.col("__q").cast("decimal(38,0)") * F.col("__q")).alias("__ss"),
    )
    mean = F.col("__s").cast("double") / F.col("__n").cast("double")
    var = (
        F.col("__ss").cast("double") / F.col("__n").cast("double")
        - mean * mean
    )
    stats = stats.select(
        "event_type", "__n",
        mean.alias("__mean"),
        F.expr("sqrt(greatest(__ss / cast(__n as double) "
               "- (__s / cast(__n as double)) * (__s / cast(__n as double)), "
               "0.0D))").alias("__std"),
    )
    # nullif: a constant-valued group has std 0 - its rows are not
    # anomalous (NULL z), never a DIVIDE_BY_ZERO
    z = (F.col("__q").cast("double") - F.col("__mean")) / F.expr(
        "nullif(__std, 0.0D)"
    )
    return (
        base.join(F.broadcast(stats), "event_type")
        .select("event_type", "__n", z.alias("__z"))
        .groupBy("event_type")
        .agg(
            F.max("__n").alias("n"),
            # when/otherwise, not a bool cast: a NULL z (zero-variance
            # group) must count 0, matching the oracle's CASE ELSE 0
            F.sum(
                F.when(
                    (F.col("__z") > 3.0) | (F.col("__z") < -3.0), F.lit(1)
                ).otherwise(F.lit(0)).cast("long")
            ).alias("n_anomalies"),
            F.round(F.min("__z"), 6).alias("min_z"),
            F.round(F.max("__z"), 6).alias("max_z"),
        )
    )
