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


def test_negative_and_tied_boundaries(spark):
    vals = [-5.0, -5.0, -5.0, 0.0, 0.0, 3.0, 7.0, 7.0]
    _check_ranks(spark, vals, list(range(8)), bins=4, gather_threshold=2)


def test_nulls_are_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    got = exact_order_stats(df, "x", [0, 1, 2])
    assert [got[0], got[1], got[2]] == [1.0, 2.0, 3.0]


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
