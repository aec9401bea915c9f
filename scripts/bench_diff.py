#!/usr/bin/env python
"""Compare two bench detail files with environment normalization.

Raw cross-round bench deltas are dominated by container variance (the
r04→r05 boot shifted EVERY query ~1.7× uniformly, including ones whose
code did not change). The honest per-query signal is the ratio relative
to the run's median shift: a query is a REGRESSION-SUSPECT only if it
slowed down substantially more than the round as a whole.

Usage:
  python scripts/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Accepts either a BENCH_DETAIL.json ({"queries": {...}}) or a raw
BENCH_r{N}.json whose "parsed" field or "queries" field holds the map.
Prints one JSON line per suspect plus a summary line.
"""

from __future__ import annotations

import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    for key in ("queries", "parsed"):
        inner = d.get(key)
        if isinstance(inner, dict):
            if "queries" in inner and isinstance(inner["queries"], dict):
                inner = inner["queries"]
            return {
                k: float(v)
                for k, v in inner.items()
                if isinstance(v, (int, float))
            }
    raise SystemExit(f"{path}: no queries map found")


def main() -> int:
    threshold = 1.3
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                threshold = float(argv[i])
            else:
                raise SystemExit("--threshold needs a value")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load_queries(args[0]), load_queries(args[1])
    common = sorted(k for k in old if k in new and old[k] > 0)
    if not common:
        raise SystemExit("no common queries")
    ratios = {k: new[k] / old[k] for k in common}
    env = statistics.median(ratios.values())
    suspects = []
    for k in common:
        norm = ratios[k] / env
        if norm > threshold:
            suspects.append((norm, k))
            print(json.dumps({
                "query": k, "old_sec": round(old[k], 3),
                "new_sec": round(new[k], 3),
                "raw_ratio": round(ratios[k], 2),
                "env_normalized_ratio": round(norm, 2),
                "verdict": "REGRESSION-SUSPECT",
            }))
    print(json.dumps({
        "n_common": len(common),
        "median_env_shift": round(env, 3),
        "n_suspects": len(suspects),
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "threshold": threshold,
    }))
    return 1 if suspects else 0


if __name__ == "__main__":
    raise SystemExit(main())
