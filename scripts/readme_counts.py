#!/usr/bin/env python
"""Regenerate README status counts from the ground truth, so the README
can never drift optimistic again (it did in r2/r3/r4).

Counts patched in place:
  - "N declared queries"          <- len(__spark_entry__.queries())
  - "N tests passing, K ... skips" <- an actual `pytest -q` run

Usage:
  python scripts/readme_counts.py                # uses PYTEST_SUMMARY env
  python scripts/readme_counts.py --run-pytest   # runs the suite (~7 min)
  PYTEST_SUMMARY="212 passed, 6 skipped" python scripts/readme_counts.py

Without --run-pytest, the pass/skip numbers come from $PYTEST_SUMMARY
(paste the summary line of the run you just did); the script REFUSES to
touch the test-count line if neither source is available — mechanical or
nothing.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
README = os.path.join(REPO, "README.md")


def query_count() -> int:
    import __spark_entry__ as e

    return len(e.queries())


def pytest_counts() -> tuple[int, int] | None:
    summary = os.environ.get("PYTEST_SUMMARY", "")
    if "--run-pytest" in sys.argv[1:]:
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            cwd=REPO, capture_output=True, text=True,
        ).stdout
        summary = out.strip().splitlines()[-1] if out.strip() else ""
    m = re.search(r"(\d+) passed", summary)
    if not m:
        return None
    if re.search(r"\d+ (failed|error)", summary):
        # a red suite must never be written up as "N tests passing" —
        # that is the optimistic drift this script exists to prevent
        raise SystemExit(
            f"refusing to record a failing suite: {summary.strip()!r}"
        )
    passed = int(m.group(1))
    ms = re.search(r"(\d+) skipped", summary)
    return passed, int(ms.group(1)) if ms else 0


def main() -> int:
    with open(README) as f:
        text = f.read()
    orig = text

    nq = query_count()
    text = re.sub(r"\d+ declared queries", f"{nq} declared queries", text)
    text = re.sub(
        r"all \d+ queries match DuckDB", f"all {nq} queries match DuckDB",
        text,
    )

    counts = pytest_counts()
    if counts is None:
        print(
            "NOTE: no pytest summary (set PYTEST_SUMMARY or pass "
            "--run-pytest); test-count line left untouched"
        )
    else:
        passed, skipped = counts
        text = re.sub(
            r"\d+ tests passing, \d+ import-gated skips",
            f"{passed} tests passing, {skipped} import-gated skips",
            text,
        )
        print(f"tests: {passed} passed, {skipped} skipped")

    print(f"queries: {nq}")
    if text != orig:
        with open(README, "w") as f:
            f.write(text)
        print("README.md updated")
    else:
        print("README.md already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
