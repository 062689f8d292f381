"""bench.py output-contract tripwires (no Spark).

The driver records only the LAST 2000 characters of bench stdout; the
round-4 verdict's task 8 exists because the full per-query JSON line
outgrew that window in rounds 2-4. The compact final line must stay
recoverable at any plausible registry size, and the headline list must
remain a subset of the registry so the bench can't KeyError mid-run.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402
from database_fragmentation_and_query_processor_spark import (  # noqa: E402
    entry_queries as EQ,
)


def _fake_out(n_queries: int) -> dict:
    qs = {f"some_quite_long_query_name_number_{i:04d}": float(i % 37) / 3
          for i in range(n_queries)}
    qs["a_failed_one"] = "ERR AnalysisException"
    slow10 = sorted((k for k, v in qs.items() if isinstance(v, float)),
                    key=lambda k: -qs[k])[:10]
    return {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "queries": qs,
        "errors": 1,
        "sf": 0.1,
        "cpus": 32,
        "retimed": {k: qs[k] / 7 for k in slow10},
        "r1_subset_total": 55.5,
        "r1_subset_n": 53,
    }


def test_compact_line_fits_tail_window_at_400_queries():
    line = json.dumps(bench.compact_summary(_fake_out(400)))
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["n_queries"] == 401
    assert len(parsed["slowest"]) == 10
    # each slowest entry is a [first, retimed] pair
    for first, retimed in parsed["slowest"].values():
        assert isinstance(first, float) and retimed == first / 7
    assert parsed["full_results"] == "BENCH_FULL.json"


def test_compact_line_survives_all_error_run():
    out = _fake_out(0)
    line = json.dumps(bench.compact_summary(out))
    assert json.loads(line)["slowest"] == {}


def test_headline_is_subset_of_registry():
    missing = set(bench.HEADLINE) - set(EQ.QUERIES)
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_every_registry_query_is_benched():
    """Reverse containment: a registry addition that forgets the
    HEADLINE append runs un-timed — exactly how the r14 second wave
    initially missed its first full-bench pass. Keep both sets equal."""
    unbenched = set(EQ.QUERIES) - set(bench.HEADLINE)
    assert not unbenched, unbenched


def test_retime_candidates_adds_per_line_quiet_trigger():
    """R10: the retime set = global slowest-10 ∪ any line >3x its own
    historical quiet value (≥ the absolute floor) — the per-line
    trigger catches a fast-in-absolute-terms query sitting in a
    contended window, which the global top-10 misses (the r8/r9
    demonstrated failure mode)."""
    timings = {f"q{i:02d}": 10.0 + i for i in range(10)}  # the top 10
    timings["spiked"] = 2.0      # > 3x its 0.5 quiet -> retimed
    timings["steady"] = 2.0      # at its own quiet -> not retimed
    timings["tiny_spike"] = 0.3  # 3x of 0.1 but under floor -> skipped
    timings["broken"] = "ERR AnalysisException"
    quiet = {"spiked": 0.5, "steady": 2.0, "tiny_spike": 0.1}
    cand = bench.retime_candidates(timings, quiet)
    assert len([c for c in cand if c.startswith("q")]) == 10
    assert "spiked" in cand
    assert "steady" not in cand
    assert "tiny_spike" not in cand
    assert "broken" not in cand


def test_retime_candidates_cap_bounds_contended_runs():
    timings = {f"s{i:03d}": 5.0 for i in range(100)}
    quiet = {k: 0.1 for k in timings}
    cand = bench.retime_candidates(timings, quiet)
    assert len(cand) == 10 + bench.RETIME_EXTRA_CAP


def test_quiet_record_covers_the_registry():
    """QUIET_LINES.json must know every registered query at sf0.1 —
    a registry addition without a quiet line silently opts out of the
    per-line trigger (bench.py folds each run in, so the file stays
    current once seeded; new queries gain their line on first bench)."""
    quiet = bench.load_quiet(0.1)
    known = set(quiet)
    registered = set(EQ.QUERIES)
    # newest additions gain their quiet line on the first bench run
    # after registration; exclude only the CURRENT below-window batches
    missing = (
        registered
        - known
        - set(getattr(EQ, "_R13_ADDED", []))
        - set(getattr(EQ, "_R14_ADDED", []))
    )
    assert not missing, missing


def test_scan_split_bytes_is_scale_adaptive(tmp_path):
    """r14: the bench derives the parquet split size from the
    warehouse's total bytes (≈2 scan waves per core, clamped to
    [1 MB, 128 MB]) — small fixtures parallelize their scan-stage map
    work, while at warehouse scale the formula returns the stock
    128 MB so cluster plans are untouched."""
    import bench

    mb = 1024 * 1024
    # tiny fixture → floor clamp
    (tmp_path / "t.parquet").write_bytes(b"x" * 1000)
    assert bench.scan_split_bytes(str(tmp_path), 32) == mb
    # mid-size: total/(2*cpus), inside the clamp band
    (tmp_path / "big.parquet").write_bytes(b"x" * (256 * mb))
    got = bench.scan_split_bytes(str(tmp_path), 32)
    assert mb <= got <= 128 * mb
    assert got == (256 * mb + 1000) // 64
    # huge warehouse (simulated by cpus=1) → ceiling clamp = stock 128 MB
    assert bench.scan_split_bytes(str(tmp_path), 1) == 128 * mb
    # unreadable dir → stock default, never an exception
    assert bench.scan_split_bytes(str(tmp_path / "nope"), 32) == 128 * mb


def test_scan_split_bytes_floors_at_row_group(tmp_path):
    """r15 (r14 verdict task 1): the split never drops below the
    warehouse's largest parquet row group — a sub-row-group split adds
    only empty scan tasks (the group is read whole by one split), which
    the r15 A/B measured as pure regression on blob/text scans."""
    import bench
    import pytest

    pa = pytest.importorskip("pyarrow")
    pq = pytest.importorskip("pyarrow.parquet")

    mb = 1024 * 1024
    # one ~3 MB single-row-group parquet table (incompressible payload)
    import random

    rnd = random.Random(7)
    payload = [bytes(rnd.getrandbits(8) for _ in range(3000)) for _ in range(1024)]
    t = pa.table({"b": payload})
    pq.write_table(t, tmp_path / "blob.parquet", row_group_size=1 << 20,
                   compression="none")
    rg = bench._largest_row_group_bytes(str(tmp_path))
    assert rg > 2 * mb  # the single row group really is multi-MB
    # total/(2*32) ≈ 48 KB — WITHOUT the floor the clamp would return
    # 1 MB; with it, the split covers the whole row group
    got = bench.scan_split_bytes(str(tmp_path), 32)
    assert got >= rg
    assert got <= 128 * mb
