"""README status counts must equal ground truth — mechanized.

The README drifted optimistic in r2/r3/r4 and stale in r8 (it said
"125 declared queries" while queries() returned 127, caught by the r8
judge). scripts/readme_counts.py exists to regenerate the counts; this
test is the gate that makes forgetting to run it a pytest failure —
the ORACLE_MANIFEST lesson applied to docs.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _readme() -> str:
    with open(os.path.join(REPO, "README.md")) as f:
        return f.read()


def test_readme_declared_query_count_matches_queries():
    import __spark_entry__ as e

    nq = len(e.queries())
    text = _readme()
    declared = [int(m) for m in re.findall(r"(\d+) declared queries", text)]
    assert declared, "README lost its 'N declared queries' status line"
    assert all(d == nq for d in declared), (
        f"README says {declared} declared queries but queries() returns "
        f"{nq} — run `python scripts/readme_counts.py`"
    )
    matched = [
        int(m) for m in re.findall(r"all (\d+) queries match DuckDB", text)
    ]
    assert matched, "README lost its 'all N queries match DuckDB' line"
    assert all(d == nq for d in matched), (
        f"README says all {matched} queries match DuckDB but queries() "
        f"returns {nq} — run `python scripts/readme_counts.py`"
    )


def test_oracle_manifest_count_matches_queries():
    """The committed ORACLE_MANIFEST.json must cover exactly the
    declared query set (test_oracle_audit checks the hashes; this pins
    the cardinality so a forgotten --write after adding a query fails
    by name here too)."""
    import json

    with open(os.path.join(REPO, "ORACLE_MANIFEST.json")) as f:
        manifest = json.load(f)
    import __spark_entry__ as e

    assert set(manifest) == set(e.queries()), (
        "ORACLE_MANIFEST.json and queries() disagree — run "
        "`python scripts/oracle_manifest.py --write` and re-certify "
        "any changed queries"
    )
