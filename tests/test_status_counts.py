"""Status-doc drift guard: the README's query counts are asserted
against the live driver-contract registry (the counts drifted by hand
in rounds 1 and 2 — this makes the docs fail the suite instead)."""

from __future__ import annotations

import os
import re

import __spark_entry__ as entrymod

_README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_registry():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    text = open(_README).read()
    m = re.search(r"(\d+) driver-contract queries, (\d+) "
                  r"DuckDB-oracle-checked", text)
    assert m, "README.md lost its counts sentence"
    assert int(m.group(1)) == len(qs), (
        f"README says {m.group(1)} queries, registry has {len(qs)}")
    assert int(m.group(2)) == len(osql), (
        f"README says {m.group(2)} oracle-checked, registry has "
        f"{len(osql)}")


def test_every_oracle_key_has_a_query():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)


def test_rows_only_set_is_exactly_the_documented_one():
    """Every query has an oracle — cdx_checksum_computed's grey era
    ended when the recursive-CTE SHA-1 oracle landed (DuckDB 1.0 has
    no sha1 scalar, so the oracle implements the algorithm itself);
    any new rows-only query must be consciously added here with its
    impossibility argument."""
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(qs) - set(osql) == set()
