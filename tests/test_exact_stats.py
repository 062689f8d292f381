"""Exact distributed order statistics (operators/stats.py): the
bounded-state replacement for Spark's single-task exact ``percentile``
aggregate. Every case cross-checks against Python's sorted() ground
truth; the adversarial cases force multiple bisection iterations with
tiny bins/thresholds so the refinement loop itself is exercised, not
just the one-histogram happy path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.operators.stats import (
    exact_order_stats,
    exact_percentiles,
)


def _df(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "x double")


def _check_ranks(spark, values, ranks, **kw):
    got = exact_order_stats(_df(spark, values), "x", ranks, **kw)
    ordered = sorted(values)
    for r in ranks:
        assert got[r] == ordered[r], (r, got[r], ordered[r])


def test_uniform_values_small_gather(spark):
    rnd = random.Random(7)
    vals = [rnd.uniform(-1000, 1000) for _ in range(5000)]
    _check_ranks(spark, vals, [0, 1, 1249, 2500, 4998, 4999],
                 bins=16, gather_threshold=50)


def test_heavy_duplicates_resolve_via_min_eq_max(spark):
    # 90% of the mass is ONE value: the containing bin never shrinks by
    # count — it must resolve through the min==max collapse path.
    vals = [42.0] * 4500 + [float(i) for i in range(500)]
    _check_ranks(spark, vals, [0, 100, 2500, 4999], bins=8,
                 gather_threshold=10)


def test_adversarial_clustering_forces_iterations(spark):
    # values packed into 1e-9 of the range: the first histogram puts
    # everything in one bin; observed (min, max) must re-zoom.
    vals = [1e9 + i * 1e-3 for i in range(2000)] + [-1e9]
    _check_ranks(spark, vals, [0, 1, 1000, 2000], bins=4,
                 gather_threshold=16)


def test_near_dbl_max_range_width_overflow(spark):
    # both endpoints pass isfinite but (hi - lo) overflows to +inf —
    # the proportional bin id would degenerate (round-5 ADVICE). The
    # driver-side width guard must fall back to a midpoint split and
    # still converge to exact answers.
    big = 1.7e308
    vals = [-big, -big / 2, -1.0, 0.0, 1.0, 2.0, 3.0, big / 2, big]
    assert not (vals[-1] - vals[0]) < float("inf")  # width IS +inf
    _check_ranks(spark, vals, list(range(9)), bins=4, gather_threshold=2)


def test_negative_and_tied_boundaries(spark):
    vals = [-5.0, -5.0, -5.0, 0.0, 0.0, 3.0, 7.0, 7.0]
    _check_ranks(spark, vals, list(range(8)), bins=4, gather_threshold=2)


def test_error_paths(spark):
    import pytest

    empty = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError, match="empty"):
        exact_order_stats(empty, "x", [0])
    with pytest.raises(ValueError, match="empty"):
        exact_percentiles(empty, "x", [0.5])
    three = _df(spark, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="out of range"):
        exact_order_stats(three, "x", [3])
    with pytest.raises(ValueError, match="out of range"):
        exact_order_stats(three, "x", [-1])
    assert exact_order_stats(three, "x", []) == {}
    inf = _df(spark, [1.0, float("inf"), 2.0])
    with pytest.raises(ValueError, match="finite"):
        exact_order_stats(inf, "x", [0])


def test_nulls_are_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    got = exact_order_stats(df, "x", [0, 1, 2])
    assert [got[0], got[1], got[2]] == [1.0, 2.0, 3.0]


def test_grouped_percentiles_match_spark_grouped_exact(spark):
    """Per-group results equal Spark's groupBy + exact percentile, on
    skewed group sizes (one dominant group, several small ones) with
    tiny bins/thresholds so multiple groups' segments share the same
    histogram scans."""
    from database_fragmentation_and_query_processor_spark.operators.stats import (
        grouped_exact_percentiles,
    )

    rnd = random.Random(3)
    rows = []
    for g, size in (("big", 4000), ("mid", 300), ("tiny", 7), ("one", 1)):
        rows += [(g, rnd.uniform(-100, 100)) for _ in range(size)]
    df = spark.createDataFrame(rows, "g string, x double")
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = grouped_exact_percentiles(
        df, ["g"], "x", ps, bins=8, gather_threshold=64
    )
    ref = {
        r["g"]: r["pv"]
        for r in df.groupBy("g")
        .agg(
            F.expr(
                f"percentile(x, array({','.join(str(p) for p in ps)}))"
            ).alias("pv")
        )
        .collect()
    }
    assert set(got) == {("big",), ("mid",), ("tiny",), ("one",)}
    for key, (vals, n) in got.items():
        for g_v, r_v in zip(vals, ref[key[0]]):
            assert abs(g_v - r_v) < 1e-9 * max(1.0, abs(r_v)), (key, g_v, r_v)
    assert got[("big",)][1] == 4000 and got[("one",)][1] == 1


def test_grouped_percentiles_df_matches_grouped_agg(spark):
    """The DataFrame form equals Spark's groupBy + exact percentile and
    keeps group-column types."""
    from database_fragmentation_and_query_processor_spark.operators.stats import (
        grouped_percentiles_df,
    )

    rnd = random.Random(5)
    rows = [(i % 4, rnd.uniform(0, 100)) for i in range(800)]
    df = spark.createDataFrame(rows, "g bigint, x double")
    ps = [0.1, 0.5, 0.9]
    got = grouped_percentiles_df(df, ["g"], "x", ps, bins=8,
                                 gather_threshold=50)
    assert dict(got.dtypes) == {"g": "bigint",
                                "percentiles": "array<double>", "n": "bigint"}
    ref = {
        r["g"]: r["pv"]
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(x, array({','.join(map(str, ps))}))").alias("pv"))
        .collect()
    }
    for r in got.collect():
        assert r["n"] == 200
        for a, b in zip(r["percentiles"], ref[r["g"]]):
            assert abs(a - b) < 1e-9 * max(1.0, abs(b))


def test_grouped_percentiles_ignore_null_values(spark):
    from database_fragmentation_and_query_processor_spark.operators.stats import (
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", 5.0)], "g string, x double"
    )
    got = grouped_exact_percentiles(df, ["g"], "x", [0.5])
    assert got[("a",)] == ([2.0], 2)
    assert got[("b",)] == ([5.0], 1)


def test_percentiles_match_spark_exact_percentile(spark):
    """The interpolated result equals Spark's own exact ``percentile``
    (which is the DuckDB quantile_cont definition) — on data where the
    built-in's single-task buffering is still affordable."""
    rnd = random.Random(11)
    vals = [rnd.uniform(0, 1e6) for _ in range(3000)]
    df = _df(spark, vals)
    ps = [i / 8 for i in range(9)]
    got, n = exact_percentiles(df, "x", ps, bins=16, gather_threshold=100)
    assert n == 3000
    ref = df.agg(
        F.expr(f"percentile(x, array({','.join(str(p) for p in ps)}))")
    ).head()[0]
    for g, r in zip(got, ref):
        assert abs(g - r) < 1e-9 * max(1.0, abs(r)), (g, r)


def test_grouped_median_mad_paths_agree(spark):
    """grouped_median_mad's one-transfer fast path (every group under
    the gather threshold) and its two-round selector fallback (forced
    with a tiny threshold) must produce identical (median, MAD, n) —
    and both must equal a numpy percentile_cont reference."""
    import numpy as np

    from database_fragmentation_and_query_processor_spark.operators.stats import (
        grouped_median_mad,
    )

    rnd = random.Random(23)
    rows = [("a", rnd.uniform(0, 100)) for _ in range(501)] + [
        ("b", rnd.uniform(-50, 50)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    fast = grouped_median_mad(df, ["g"], "x")
    slow = grouped_median_mad(df, ["g"], "x", bins=8, gather_threshold=32)
    assert set(fast) == set(slow) == {("a",), ("b",)}
    for key in fast:
        fm, fd, fn = fast[key]
        sm, sd, sn = slow[key]
        assert fn == sn
        assert abs(fm - sm) < 1e-9 and abs(fd - sd) < 1e-9
        vs = np.array([x for g, x in rows if (g,) == key])
        ref_med = float(np.percentile(vs, 50))
        ref_mad = float(np.percentile(np.abs(vs - ref_med), 50))
        assert abs(fm - ref_med) < 1e-9
        assert abs(fd - ref_mad) < 1e-9
