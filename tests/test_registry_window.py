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
    """R14 window (the rotation the r13 verdict's task 1 prescribed) =
    5 pinned frag rows, streaming_near_dup_compaction's FIRST driver
    stamp (the only entry with zero driver evidence — green makes the
    cumulative record 323/323 of the r13 surface), the 11 r14 restamps
    (DECIMAL-cast oracles, the build-once ANN/tokenizer artifact
    consumers, the delta-layout policy changes), and 33 refills from
    the round-13 window in its original order."""
    names = list(EQ.QUERIES)
    assert names[:5] == FRAG_PINNED
    assert names[5:6] == EQ._R13_ADDED == ["streaming_near_dup_compaction"]
    assert names[6:17] == EQ._R14_RESTAMP
    assert names[:50] == EQ._R14_WINDOW
    assert len(names) == len(set(names))


def test_r13_window_composition_historical():
    """Historical pin: the r13 window front-loaded the
    line_quality_filter restamp (the r12 hash red, traced to the
    ORACLE's un-cast HUGEINT SUMs) then the 3 _R12_ADDED — the shape
    the r13 driver stamped (CORRECTNESS_r13.json, 50/50 green)."""
    assert EQ._R13_WINDOW[:5] == FRAG_PINNED
    assert EQ._R13_WINDOW[5:6] == ["line_quality_filter"]
    assert EQ._R13_WINDOW[6:9] == EQ._R12_ADDED
    assert set(EQ._R13_RESTAMP) <= set(EQ._R13_WINDOW)


def test_r12_window_composition_historical():
    """Historical pin: the r12 window front-loaded the
    line_quality_filter restamp then the 30 _R11_ADDED — the shape the
    r12 driver stamped (CORRECTNESS_r12.json, 49/50: the one red was
    line_quality_filter's value hash, adjudicated in r12's verdict as
    an oracle typing bug and fixed in r13)."""
    assert EQ._R12_WINDOW[:5] == FRAG_PINNED
    assert EQ._R12_WINDOW[5:6] == EQ._R12_RESTAMP == ["line_quality_filter"]
    assert EQ._R12_WINDOW[6:36] == EQ._R11_ADDED


def test_r10_window_composition_historical():
    """Historical pin: the r10 window front-loaded the 3 _R9_ADDED
    then the 7 r10 restamps — the shape the r10 driver stamped
    (CORRECTNESS_r10.json, 49/50: line_quality_filter's value hash was
    the one red; it restamps in r11 on the lattice rebuild)."""
    assert EQ._R10_WINDOW[:5] == FRAG_PINNED
    assert EQ._R10_WINDOW[5:8] == EQ._R9_ADDED
    assert EQ._R10_WINDOW[8:15] == EQ._R10_RESTAMP


def test_r9_window_composition_was_backlog_closing():
    """Historical pin: the r9 window front-loaded ALL 26 _R8_DEFERRED
    queries after the frag pins, then the 6 r9 restamps — the shape the
    r9 driver stamped (CORRECTNESS_r09.json, 50/50 green)."""
    assert EQ._R9_WINDOW[:5] == FRAG_PINNED
    assert EQ._R9_WINDOW[5:31] == EQ._R9_STAMP == EQ._R8_DEFERRED
    assert EQ._R9_WINDOW[31:37] == EQ._R9_RESTAMP


def test_r8_split_covered_all_r7_additions():
    """The two-round rotation lost nothing: r8 stamp ∪ deferred is
    exactly the 67 round-7 additions, disjointly."""
    assert set(EQ._R8_STAMP) | set(EQ._R8_DEFERRED) == set(EQ._R7_ADDED)
    assert not set(EQ._R8_STAMP) & set(EQ._R8_DEFERRED)
    assert len(EQ._R8_STAMP) == 41 and len(EQ._R8_DEFERRED) == 26


def test_window_closes_the_evidence_gap():
    """After the r13 rotation, every query registered through r13 has a
    stamp OR sits inside the current window: the only r13-surface entry
    without a driver row through r13 is streaming_near_dup_compaction,
    which the r14 window front-loads — a green round makes cumulative
    driver evidence 323/323 of that surface (the _R14_ADDED queries
    register BELOW the window and rotate in next round, per the
    standing convention)."""
    stamped = _stamped_through(13)
    if not stamped:  # correctness files absent (fresh checkout)
        return
    names = list(EQ.QUERIES)
    window = set(names[:50])
    never_stamped = {
        n for n in names if n not in stamped and n not in set(
            getattr(EQ, "_R14_ADDED", [])
        )
    }
    assert never_stamped == set(EQ._R13_ADDED)
    assert never_stamped <= window


def test_window_restamps_every_round11_modified_query():
    """Every query whose implementation changed in round 11 must get a
    fresh driver stamp on the new code path: line_quality_filter (the
    r10 value-hash red, rebuilt on the NLL_LATTICE quantization). The
    other r11-hardened float surfaces are all _R10_ADDED and enter
    through the rotation anyway."""
    names = list(EQ.QUERIES)
    assert set(EQ._R11_RESTAMP) == {"line_quality_filter"}
    assert set(EQ._R11_RESTAMP) <= set(names[:50])


def test_every_query_has_an_oracle():
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL), (
        set(EQ.QUERIES) ^ set(EQ.ORACLE_SQL)
    )


def test_oracles_are_plain_select_strings():
    for name, sql in EQ.ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
