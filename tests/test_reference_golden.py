"""Golden-output tests reproducing the reference's committed query
results (rangeResult.txt / pointResult.txt): provenance column,
duplicate emission across schemes, inclusive bounds, range-side
rating-ascending order, and the reference file format."""

from __future__ import annotations

import pytest

from database_fragmentation_and_query_processor_spark import api

from .conftest import RATINGS_FIXTURE

N = 5


@pytest.fixture()
def fragmented(spark, ratings_file, warehouse):
    api.load_ratings(spark, "ratings", ratings_file, warehouse)
    api.range_partition(spark, "ratings", N, warehouse)
    api.round_robin_partition(spark, "ratings", N, warehouse)
    return warehouse


def _expected_range_side(lo: float, hi: float) -> list[tuple]:
    """Range-side expectation derived from the fixture + boundary rule:
    fragment-major then rating-ascending."""
    import math

    rows = []
    for u, m, r in RATINGS_FIXTURE:
        if lo <= r <= hi:
            interval = 5.0 / N
            f = 0 if r <= interval else min(math.ceil(r / interval) - 1, N - 1)
            rows.append((f, r, u, m))
    rows.sort(key=lambda t: (t[0], t[1]))
    return [(f"range_ratings_part{f}", u, m, r) for f, r, u, m in rows]


def test_range_query_golden_semantics(spark, fragmented, tmp_path):
    """rangeQuery(1.5, 3.5) → golden rangeResult.txt: 18 rows, 9 per
    scheme, every qualifying tuple emitted once per scheme."""
    out = str(tmp_path / "rangeResult.txt")
    df = api.range_query(spark, 1.5, 3.5, fragmented, output_path=out)
    rows = df.collect()
    assert len(rows) == 18

    range_side = [tuple(r) for r in rows if r[0].startswith("range_")]
    rr_side = [tuple(r) for r in rows if r[0].startswith("round_robin_")]
    assert len(range_side) == 9 and len(rr_side) == 9

    # range side: exact order (fragment-major, rating-ascending)
    assert range_side == _expected_range_side(1.5, 3.5)

    # rr side: same tuple multiset, provenance in part0..4
    exp_tuples = sorted((u, m, r) for u, m, r in RATINGS_FIXTURE if 1.5 <= r <= 3.5)
    assert sorted((u, m, r) for _, u, m, r in rr_side) == exp_tuples
    assert all(name.startswith("round_robin_ratings_part") for name, *_ in rr_side)

    # file format: comma-joined, floats rendered 2.0-style
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 18
    assert all(line.count(",") == 3 for line in lines)
    assert any(line.endswith("2.0") for line in lines)


def test_point_query_golden_semantics(spark, fragmented, tmp_path):
    """pointQuery(4.5) → golden pointResult.txt: 1 hit per scheme,
    range side in fragment 4 ((4,5] owns 4.5 with n=5)."""
    out = str(tmp_path / "pointResult.txt")
    df = api.point_query(spark, 4.5, fragmented, output_path=out)
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 2
    names = {r[0] for r in rows}
    assert "range_ratings_part4" in names
    assert any(n.startswith("round_robin_ratings_part") for n in names)
    assert all((r[1], r[2], r[3]) == (1, 185, 4.5) for r in rows)


REFERENCE_DIR = "/root/reference"


@pytest.mark.skipif(
    not __import__("os").path.exists(f"{REFERENCE_DIR}/test_data1.txt"),
    reason="reference fixture not present",
)
def test_reference_fixture_byte_parity(spark, warehouse, tmp_path):
    """End-to-end byte parity on the reference's OWN fixture: load
    test_data1.txt, 5-way partition both schemes, then rangeQuery(1.5,
    3.5) and pointQuery(4.5) (the exact tester1.py invocation) must
    reproduce rangeResult.txt / pointResult.txt verbatim — including
    the ``str(2.0)`` float rendering and the range-side-first ordering.
    The committed reference files lack a trailing newline; our sink
    terminates the last line, so the expectation is ref + '\\n'."""
    import os
    import shutil

    src = str(tmp_path / "ratings.txt")
    shutil.copy(f"{REFERENCE_DIR}/test_data1.txt", src)
    api.load_ratings(spark, "ratings", src, warehouse)
    api.range_partition(spark, "ratings", N, warehouse)
    api.round_robin_partition(spark, "ratings", N, warehouse)

    range_out = str(tmp_path / "rangeResult.txt")
    point_out = str(tmp_path / "pointResult.txt")
    api.range_query(spark, 1.5, 3.5, warehouse, output_path=range_out)
    api.point_query(spark, 4.5, warehouse, output_path=point_out)

    for got_path, ref_name in (
        (range_out, "rangeResult.txt"),
        (point_out, "pointResult.txt"),
    ):
        with open(got_path, "rb") as f:
            got = f.read()
        with open(os.path.join(REFERENCE_DIR, ref_name), "rb") as f:
            ref = f.read()
        assert got == ref + b"\n", f"{ref_name}: byte mismatch"


def test_point_query_endpoint_absorb(spark, fragmented):
    """rating==5.0 → last fragment; rating==0.0 → fragment 0."""
    hi = api.point_query(spark, 5.0, fragmented).collect()
    assert {r[0] for r in hi if r[0].startswith("range_")} == {"range_ratings_part4"}
    assert len([r for r in hi if r[0].startswith("range_")]) == 5  # five 5.0 ratings
    lo = api.point_query(spark, 0.0, fragmented).collect()
    assert {r[0] for r in lo if r[0].startswith("range_")} == {"range_ratings_part0"}
