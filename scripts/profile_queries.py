#!/usr/bin/env python
"""Per-query phase profiler (r11 optimization round).

For each ``__spark_entry__.queries()`` entry, reports separately:

- build_s: time spent INSIDE the query function — driver-side work,
  including every training-loop ``bounded_collect`` round (each one is
  a full Spark job);
- exec_s:  time of the final noop-sink execution of the returned plan;
- jobs:    Spark jobs launched during build / exec (statusTracker delta).

A query whose build_s dominates is driver-roundtrip-bound (training
loops), not plan-bound — a different fix (fewer/parallel collect rounds)
than a slow plan (fewer shuffles). Usage mirrors bench.py:

    python scripts/profile_queries.py [sf_dir] [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    only = set(args)

    import __spark_entry__ as entrymod
    from streamtasks_spark.session import get_spark

    spark = get_spark("profile")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tracker = spark.sparkContext.statusTracker()

    qs = entrymod.queries()
    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        # one full warm-up (codegen), untimed — mirrors bench.py
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        spark.catalog.clearCache()
        j0 = max(tracker.getJobIdsForGroup() or [-1])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        j1 = max(tracker.getJobIdsForGroup() or [-1])
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        j2 = max(tracker.getJobIdsForGroup() or [-1])
        rows.append({
            "query": name,
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "build_jobs": j1 - j0,
            "exec_jobs": j2 - j1,
        })
        print(
            f"{name:32s} build {t1 - t0:6.2f}s ({j1 - j0:3d} jobs)  "
            f"exec {t2 - t1:6.2f}s ({j2 - j1:3d} jobs)",
            file=sys.stderr, flush=True,
        )
    rows.sort(key=lambda r: -(r["build_s"] + r["exec_s"]))
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
