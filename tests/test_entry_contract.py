"""Driver-contract shape tests (no Spark session needed).

The driver's correctness gate checks the FIRST 50 entries of
``queries()`` (CORRECTNESS_r04 was exactly the first 50 of the r4 dict),
so dict ORDER is part of the contract: round 5 front-loads the 42 queries
the r4 snapshot never reached. These pins fail if a refactor silently
reorders or drops entries.
"""

import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import __spark_entry__ as entrymod  # noqa: E402


def test_every_query_has_an_oracle():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 92
    missing = [k for k in qs if k not in oracles]
    assert missing == [], f"queries without oracle SQL: {missing}"


def test_first_50_cover_the_r4_unchecked_set():
    """Cumulative driver coverage: the 42 queries CORRECTNESS_r04 never
    checked must sit inside the first 50 slots (the driver's snapshot
    size), events_running_total first (r3 verdict's one red cell)."""
    import json
    qs = list(entrymod.queries())
    assert qs[0] == "events_running_total"
    r4_path = os.path.join(ROOT, "CORRECTNESS_r04.json")
    checked_r4 = set(json.load(open(r4_path)))
    unchecked = [q for q in qs if q not in checked_r4]
    first50 = set(qs[:50])
    assert all(q in first50 for q in unchecked), (
        "r4-unchecked queries must be in the driver-visible first 50")


def test_oracle_keys_match_query_keys():
    qs = set(entrymod.queries())
    extra = [k for k in entrymod.oracle_sql() if k not in qs]
    assert extra == [], f"oracles without a query: {extra}"
