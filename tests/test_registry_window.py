"""Driver-contract registry tripwires.

The driver stamps correctness rows for the FIRST 50 entries of
``queries()`` only, so dict order is load-bearing. These tests pin the
round-6 window so a refactor can't silently reshuffle it, and pin the
1:1 queries↔oracles invariant (every declared operator must be
hash-checkable).
"""

from __future__ import annotations

import json
import os

from database_fragmentation_and_query_processor_spark import entry_queries as EQ

FRAG_PINNED = [
    "frag_range_counts",
    "frag_rr_counts",
    "frag_range_query",
    "frag_point_query",
    "frag_insert_routing",
]

#: The six SQL-function batteries that had no driver correctness row
#: through round 5 — promoted to window positions 6-11 for round 6 so
#: the union of driver stamps covers every registered query.
R5_LEFTOVER = [
    "hof_battery",
    "setops_all_battery",
    "null_ordering_battery",
    "ignore_nulls_window_battery",
    "grouping_flags_battery",
    "lateral_ordinality_battery",
]


def _stamped_through_r5() -> set[str]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped: set[str] = set()
    for i in (1, 2, 3, 4, 5):
        path = os.path.join(repo, f"CORRECTNESS_r0{i}.json")
        if os.path.exists(path):
            with open(path) as f:
                stamped |= set(json.load(f))
    return stamped


def test_stamp_window_composition():
    names = list(EQ.QUERIES)
    assert names[:5] == FRAG_PINNED
    assert names[5:11] == R5_LEFTOVER
    assert names[:50] == EQ._R6_WINDOW
    assert len(names) == len(set(names))


def test_window_closes_the_evidence_gap():
    """After the r6 rotation, the only queries without a PRIOR driver
    stamp are the six batteries — and all six sit inside the window, so
    the post-r06 stamp union covers 100% of the registry."""
    stamped = _stamped_through_r5()
    if not stamped:  # correctness files absent (fresh checkout)
        return
    names = list(EQ.QUERIES)
    window = set(names[:50])
    never_stamped = {n for n in names if n not in stamped}
    # the six batteries (in-window, stamped by the r6 driver run) plus
    # the round-6 additions (below the window, rotating into the r7
    # prefix — the standard add-then-rotate lifecycle)
    assert never_stamped == set(R5_LEFTOVER) | set(EQ._R6_ADDED)
    assert set(R5_LEFTOVER) <= window
    assert not set(EQ._R6_ADDED) & window


def test_window_restamps_every_round6_modified_query():
    """Every query whose implementation changes in round 6 must get a
    fresh driver stamp on the new code path."""
    names = list(EQ.QUERIES)
    assert set(EQ._R6_RESTAMP) <= set(names[:50])


def test_every_query_has_an_oracle():
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL), (
        set(EQ.QUERIES) ^ set(EQ.ORACLE_SQL)
    )


def test_oracles_are_plain_select_strings():
    for name, sql in EQ.ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
