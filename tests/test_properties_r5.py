"""Property tests for the pure arithmetic inside the round-5 operators
(no Spark in the hypothesis loop — the distributed paths are covered by
tests/test_exact_stats.py; these pin the driver-side math those paths
share against external oracles)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from database_fragmentation_and_query_processor_spark.multimodal.binary_ops import (
    _payload_window_checksums,
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
    st.binary(min_size=0, max_size=300),
    st.integers(min_value=1, max_value=96),
    st.integers(min_value=1, max_value=96),
)
@settings(max_examples=300, deadline=None)
def test_payload_window_checksums_match_byte_spec(raw, window_bytes, hop_bytes):
    """The vectorized prefix-sum form must equal the per-window
    per-byte spec Σ (abs_pos+1)·byte for EVERY overlapping window of
    the payload, including the padded tail-window (empty slice → 0)."""
    n = len(raw)
    n_w = (
        max((max(n - window_bytes, 0) + hop_bytes - 1) // hop_bytes, 0) + 1
    )
    got = _payload_window_checksums(raw, n_w, window_bytes, hop_bytes)
    assert len(got) == n_w
    for i in range(n_w):
        s = i * hop_bytes
        win = raw[s : s + window_bytes]
        spec = sum((s + j + 1) * b for j, b in enumerate(win))
        assert int(got[i]) == spec


def test_window_checksum_detects_offset_and_swap():
    """The position weighting must flip the sum for an offset error and
    for a swap of unequal bytes — the failure modes a plain byte-sum
    checksum is blind to."""
    win = bytes(range(1, 65))
    at_0 = int(_payload_window_checksums(win, 1, 64, 64)[0])
    # same byte content one absolute position later
    at_1 = int(_payload_window_checksums(b"\x00" + win, 2, 64, 1)[1])
    assert at_0 != at_1
    swapped = bytes([win[1], win[0]]) + win[2:]
    assert at_0 != int(_payload_window_checksums(swapped, 1, 64, 64)[0])
