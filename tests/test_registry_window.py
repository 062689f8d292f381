"""Driver-contract registry tripwires.

The driver stamps correctness rows for the FIRST 50 entries of
``queries()`` only, so dict order is load-bearing. These tests pin the
round-8 window so a refactor can't silently reshuffle it, and pin the
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
    """R8 window = 5 pinned frag rows, 41 of the 67 round-7 additions
    (judge priorities first: the ANN family, the rank tests, the
    fragile-oracle iterative fits, every round-8-modified query; the
    rest in _R7_ADDED order), and the 4 round-8 restamps (the
    embedding-stats queries, value_regression, and term_burstiness —
    all rebuilt on exact_group_sums)."""
    names = list(EQ.QUERIES)
    assert names[:5] == FRAG_PINNED
    assert names[5:19] == EQ._R8_PRIORITY
    assert names[5:46] == EQ._R8_STAMP
    assert names[46:50] == EQ._R8_RESTAMP
    assert names[:50] == EQ._R8_WINDOW
    assert len(names) == len(set(names))


def test_r8_split_covers_all_r7_additions():
    """The two-round rotation loses nothing: stamp ∪ deferred is
    exactly the 67 round-7 additions, disjointly."""
    assert set(EQ._R8_STAMP) | set(EQ._R8_DEFERRED) == set(EQ._R7_ADDED)
    assert not set(EQ._R8_STAMP) & set(EQ._R8_DEFERRED)
    assert len(EQ._R8_STAMP) == 41 and len(EQ._R8_DEFERRED) == 26


def test_window_closes_the_evidence_gap():
    """After the r8 rotation the only queries without a PRIOR driver
    stamp are the 67 round-7 additions; 41 of them are inside the
    window (the other 26 are the documented r9 backlog), and nothing
    previously stamped fell out of evidence."""
    stamped = _stamped_through(7)
    if not stamped:  # correctness files absent (fresh checkout)
        return
    names = list(EQ.QUERIES)
    window = set(names[:50])
    never_stamped = {n for n in names if n not in stamped}
    assert never_stamped == set(EQ._R7_ADDED)
    assert set(EQ._R8_STAMP) <= window
    assert not set(EQ._R8_DEFERRED) & window


def test_window_restamps_every_round8_modified_query():
    """Every query whose implementation changed in round 8 must get a
    fresh driver stamp on the new code path — the two restamps plus
    the modified round-7 additions, which must all be in _R8_STAMP."""
    names = list(EQ.QUERIES)
    assert set(EQ._R8_RESTAMP) <= set(names[:50])
    modified_r7_additions = {
        "pca_power_iteration",
        "bloom_fp_rate_audit",
        "weighted_median_exact",
        "gpd_tail_fit",
        "gini_concentration",
        "ann_pq_topk",
        "ann_ivfpq_topk",
    }
    assert modified_r7_additions <= set(names[:50])


def test_every_query_has_an_oracle():
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL), (
        set(EQ.QUERIES) ^ set(EQ.ORACLE_SQL)
    )


def test_oracles_are_plain_select_strings():
    for name, sql in EQ.ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
