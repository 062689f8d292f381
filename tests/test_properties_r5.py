"""Property tests for the pure arithmetic inside the round-5 operators
(no Spark in the hypothesis loop — the distributed paths are covered by
tests/test_exact_stats.py; these pin the driver-side math those paths
share against external oracles)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from database_fragmentation_and_query_processor_spark.multimodal.binary_ops import (
    _window_checksum,
)
from database_fragmentation_and_query_processor_spark.operators.stats import (
    interpolate_percentiles,
    percentile_ranks,
)

# --- percentile arithmetic == numpy's linear method -------------------


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    ),
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_percentile_arithmetic_matches_numpy_linear(xs, ps):
    import numpy as np

    ordered = sorted(xs)
    n = len(ordered)
    hs, wanted = percentile_ranks(ps, n)
    assert all(0 <= r < n for r in wanted)
    got = interpolate_percentiles(hs, {r: ordered[r] for r in wanted})
    ref = np.percentile(np.array(ordered), [p * 100 for p in ps],
                        method="linear")
    for g, r in zip(got, ref):
        assert abs(g - float(r)) <= 1e-9 * max(1.0, abs(float(r))), (g, r)


@given(st.integers(min_value=1, max_value=10_000))
@settings(max_examples=200, deadline=None)
def test_percentile_ranks_endpoints_and_bounds(n):
    hs, wanted = percentile_ranks([0.0, 0.5, 1.0], n)
    assert hs[0] == 0.0 and hs[-1] == float(n - 1)
    assert min(wanted) == 0 and max(wanted) == n - 1


# --- audio-window checksum == per-byte spec ---------------------------


@given(
    st.binary(min_size=0, max_size=200),
    st.integers(min_value=0, max_value=1_000_000),
)
@settings(max_examples=300, deadline=None)
def test_window_checksum_matches_byte_spec(win, start):
    spec = sum((start + i + 1) * b for i, b in enumerate(win))
    assert _window_checksum(win, start) == spec


def test_window_checksum_detects_offset_and_swap():
    """The position weighting must flip the sum for an offset error and
    for a swap of unequal bytes — the failure modes a plain byte-sum
    checksum is blind to."""
    win = bytes(range(64))
    assert _window_checksum(win, 32) != _window_checksum(win, 33)
    swapped = bytes([win[1], win[0]]) + win[2:]
    assert _window_checksum(win, 0) != _window_checksum(swapped, 0)
