#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [sf_dir] <query ...>
       python scripts/dump_plans.py r11_before /root/testdata/sf0.1 ann_recall

Writes plans/<tag>/<query>.txt (one file per query). The tag maps to the
deliverable convention plans/r11/<query>_before.txt via --suffix.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    outdir = args[0]
    rest = args[1:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest[0]
        rest = rest[1:]
    names = rest

    import __spark_entry__ as entrymod
    from streamtasks_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names or qs:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            plan = f"PLAN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
