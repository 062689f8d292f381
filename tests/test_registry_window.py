"""Driver-contract registry tripwires.

The driver stamps correctness rows for the FIRST 50 entries of
``queries()`` only, so dict order is load-bearing. These tests pin the
round-7 window so a refactor can't silently reshuffle it, and pin the
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


def _stamped_through(last_round: int) -> set[str]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped: set[str] = set()
    for i in range(1, last_round + 1):
        path = os.path.join(repo, f"CORRECTNESS_r{i:02d}.json")
        if os.path.exists(path):
            with open(path) as f:
                stamped |= set(json.load(f))
    return stamped


def test_stamp_window_composition():
    """R7 window = 5 pinned frag rows, the 25 round-6 additions (the
    last driver-unstamped entries), the 6 round-7-modified queries,
    and a 14-query refill from the r6 window in original order."""
    names = list(EQ.QUERIES)
    assert names[:5] == FRAG_PINNED
    assert names[5:30] == EQ._R6_ADDED
    assert names[30:36] == EQ._R7_RESTAMP
    assert names[:50] == EQ._R7_WINDOW
    assert len(names) == len(set(names))


def test_window_closes_the_evidence_gap():
    """After the r7 rotation the only queries without a PRIOR driver
    stamp are the 25 round-6 additions — all inside the window — plus
    any round-7 additions rotating into the r8 prefix, so the post-r07
    stamp union covers every query registered before this round."""
    stamped = _stamped_through(6)
    if not stamped:  # correctness files absent (fresh checkout)
        return
    names = list(EQ.QUERIES)
    window = set(names[:50])
    never_stamped = {n for n in names if n not in stamped}
    assert never_stamped == set(EQ._R6_ADDED) | set(EQ._R7_ADDED)
    assert set(EQ._R6_ADDED) <= window
    assert not set(EQ._R7_ADDED) & window


def test_window_restamps_every_round7_modified_query():
    """Every query whose implementation changed in round 7 must get a
    fresh driver stamp on the new code path."""
    names = list(EQ.QUERIES)
    assert set(EQ._R7_RESTAMP) <= set(names[:50])


def test_every_query_has_an_oracle():
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL), (
        set(EQ.QUERIES) ^ set(EQ.ORACLE_SQL)
    )


def test_oracles_are_plain_select_strings():
    for name, sql in EQ.ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
