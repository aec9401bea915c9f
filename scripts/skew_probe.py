#!/usr/bin/env python
"""Hot-key skew demonstration (r12 — VERDICT r11 item 4).

Two skew surfaces, each A/B'd at bench scale with the FINAL adaptive
plan captured (AQEShuffleRead skew splits are runtime rewrites — the
initial `explain` never shows them):

1. **semantic_dedup's within-cell pairing** on a boilerplate-mode
   corpus (70% of vectors are perturbations of one direction, so one
   cell legitimately captures most of the corpus — the documented
   hot-cell scenario the ``max_cell`` cap guards). The pairing join is
   quadratic per cell and keyed by ``__cell`` (≤ n_cells distinct
   values): one hot cell = one giant shuffle partition.
2. **fact×fact equi-join with one hot key** (lineitem self-join shape:
   30% of rows re-keyed to a single value — the TPC-H q2/q8/q11/q21
   class the r11 verdict flagged).

Variants per surface:
- ``default``: AQE skew handling ON (session default) with DEFAULT
  thresholds — at local bench scale the hot partition is a few tens of
  MB, far below ``skewedPartitionThresholdInBytes`` (256 MB), so the
  split does NOT fire. This is the honest local picture: the 100 TB
  hot cell (GBs) clears the default threshold on its own.
- ``split``: thresholds scaled to the local input
  (``skewedPartitionThresholdInBytes``/``advisoryPartitionSizeInBytes``
  shrunk by the same ~1000× the data is below production scale) so the
  SAME rewrite the defaults perform at 100 TB happens here — the plan
  must contain ``AQEShuffleRead`` with ``skewed`` and the wall must
  drop.
- (surface 1 only) ``capped``: the existing ``max_cell`` guard — fast,
  but under-drops the hot cell by contract; printed for comparison.

One JSON line per (surface, variant) with wall seconds and whether the
final plan shows a skew split; plans land in plans/r12/.

Usage: python scripts/skew_probe.py [--vecs=60000] [--rows=600000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r12")

SPLIT_CONF = {
    # production defaults: factor 5, threshold 256m, advisory 64m.
    # Local corpus is ~1000x smaller than a 100 TB cell, so shrink the
    # byte thresholds by the same ratio; the FACTOR (shape test) stays
    # at its default — only the absolute byte floors are scale-bound.
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    # the coalesce floor must not re-merge the split partitions
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
}


def _set(spark, conf: dict | None):
    # always reset to session defaults first
    base = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "256m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    }
    for k, v in {**base, **(conf or {})}.items():
        spark.conf.set(k, v)


def _run(df, label: str) -> tuple[float, str]:
    """Execute via a count-all aggregate and return (wall_s, final
    adaptive plan string) — the aggregate keeps the driver transfer at
    one row while forcing the full join."""
    agg = df.groupBy().count()
    t0 = time.perf_counter()
    n = agg.collect()[0][0]
    wall = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return wall, plan, n


def _emit(surface, variant, wall, plan, n):
    skewed = "skewed" in plan
    fname = f"skew_{surface}_{variant}.txt"
    with open(os.path.join(PLANS_DIR, fname), "w") as f:
        f.write(plan)
    print(json.dumps({
        "surface": surface, "variant": variant,
        "wall_s": round(wall, 2), "rows": n,
        "plan_shows_skew_split": skewed, "plan_file": f"plans/r12/{fname}",
    }), flush=True)


def main() -> int:
    n_vecs = 60_000
    n_rows = 600_000
    for a in sys.argv[1:]:
        if a.startswith("--vecs="):
            n_vecs = int(a.split("=", 1)[1])
        if a.startswith("--rows="):
            n_rows = int(a.split("=", 1)[1])

    from streamtasks_spark.session import get_spark

    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLANS_DIR, exist_ok=True)

    # ---- surface 1: semantic_dedup within-cell pairing, hot cell ----
    # boilerplate mode: 70% of vectors = one direction + small hash
    # noise; 30% uniform-ish. dim 16 keeps the quadratic term from
    # drowning the shuffle story.
    dim = 16
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"""CASE WHEN pmod(id, 10) < 7 THEN
              transform(sequence(1, {dim}), i ->
                1.0 + cast(pmod(xxhash64(id * {dim} + i), 101) as double)
                      / 1000.0)
            ELSE
              transform(sequence(1, {dim}), i ->
                cast(pmod(xxhash64(id * {dim} + i), 2001) - 1000 as double)
                / 1000.0)
            END"""
        ).alias("embedding"),
    )
    vecs.write.mode("overwrite").parquet("/tmp/skew_vecs")
    vecs = spark.read.parquet("/tmp/skew_vecs")

    from streamtasks_spark.llmdata.similarity import semantic_dedup

    for variant, conf, max_cell in [
        ("default", None, None),
        ("split", SPLIT_CONF, None),
        ("capped", None, 10_000),
    ]:
        _set(spark, conf)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(
            f"skew_probe semantic pairing {variant}")
        out = semantic_dedup(
            vecs, dim=dim, n_cells=8, n_iters=2, threshold=0.9,
            max_cell=max_cell,
        )
        wall, plan, n = _run(out, variant)
        _emit("semantic_pairing", variant, wall, plan, n)

    # ---- surface 2: fact×fact equi-join, one hot key ----------------
    fact = spark.range(n_rows).select(
        F.expr("if(pmod(id, 10) < 3, 42, id)").alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    fact = spark.read.parquet("/tmp/skew_fact")
    dim_side = spark.range(n_rows // 4).select(
        F.expr("if(pmod(id, 10) < 3, 42, id)").alias("k"),
        (F.col("id") % 7).alias("w"),
    )
    dim_side.write.mode("overwrite").parquet("/tmp/skew_dim")
    dim_side = spark.read.parquet("/tmp/skew_dim")

    for variant, conf in [("default", None), ("split", SPLIT_CONF)]:
        _set(spark, conf)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(
            f"skew_probe factxfact {variant}")
        # hint=merge pins SMJ so the demo shows the skew rewrite, not a
        # broadcast sidestep (both sides are fact-sized at 100 TB)
        j = fact.hint("merge").join(dim_side.hint("merge"), "k").select(
            (F.col("v") + F.col("w")).alias("x")
        )
        wall, plan, n = _run(j, variant)
        _emit("fact_join", variant, wall, plan, n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
