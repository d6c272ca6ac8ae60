"""COVERAGE.md must not drift from the registry: the query count the doc
claims is asserted against ``len(all_queries())`` (the count drifted to a
stale "113" once — this pins it)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_doc_query_count_matches_registry():
    from localsql_spark.workload import all_queries

    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(r"all (\d+) have exact\s+DuckDB oracles", text)
    assert m, "COVERAGE.md no longer states its query count — keep the claim"
    assert int(m.group(1)) == len(all_queries()), (
        f"COVERAGE.md claims {m.group(1)} queries but the registry has "
        f"{len(all_queries())} — update the doc")


def test_every_query_has_oracle_or_is_documented_weak():
    """The doc's 'all N have exact DuckDB oracles' claim itself: every
    registry entry must carry an oracle (driver falls back to a weaker
    rows-only check otherwise, and the doc would be lying)."""
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    assert not missing, f"queries without oracle SQL: {missing}"
