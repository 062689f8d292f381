"""Property-based tests (hypothesis) for the load-bearing semantics the
reference only exercises with a 20-row fixture: the fixed-domain range
bucket rule and its cross-layer consistency.

A note on float boundaries: the REFERENCE itself is inconsistent at
them — rangePartition walks accumulated upper bounds
(`minVal = upperBound`, Interface1.py:140) while rangeInsert recomputes
`interval` multiplicatively (Interface1.py:236), so for adversarial
(value, n) pairs its own two paths can route one row differently. This
engine uses ONE rule everywhere (ceil of the interval quotient, clamped
— operators/fragmentation.py); the properties below pin (a) agreement
with the exact rational rule away from float-collision boundaries,
(b) totality+monotonicity (⇒ completeness+disjointness), and (c) the
invariant that actually matters for data integrity: the Python routing
rule and the Spark partitioning expression agree EXACTLY, bit for bit.
"""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.operators.query import (
    range_owner_fragment,
)


def _exact_rule(value: float, n: int, lo: float, hi: float) -> int:
    """The bucket rule in exact rational arithmetic (no float error)."""
    v = Fraction(value) - Fraction(lo)
    interval = (Fraction(hi) - Fraction(lo)) / n
    if v <= interval:
        return 0
    return min(max(math.ceil(v / interval) - 1, 0), n - 1)


@settings(max_examples=2000, deadline=None)
@given(
    value=st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
    n=st.integers(min_value=1, max_value=50),
)
def test_owner_fragment_matches_exact_rational_rule(value, n):
    got = range_owner_fragment(value, n, 0.0, 5.0)
    exact = _exact_rule(value, n, 0.0, 5.0)
    assert 0 <= got < n
    if got != exact:
        # only permissible at a float-collision boundary: the quotient
        # sits within rounding distance of an integer, and the answers
        # straddle that single boundary
        q = (Fraction(value) * n) / 5
        dist = abs(q - round(q))
        assert abs(got - exact) == 1 and dist < Fraction(1, 10**9), (
            value, n, got, exact, float(dist),
        )


@settings(max_examples=1000, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
        min_size=2, max_size=20,
    ),
    n=st.integers(min_value=1, max_value=20),
)
def test_owner_fragment_total_and_monotone(vals, n):
    """Totality + monotone non-decreasing ⇒ the fragmentation is
    complete and disjoint for ANY input, not just the 20-row fixture."""
    svals = sorted(vals)
    owners = [range_owner_fragment(v, n, 0.0, 5.0) for v in svals]
    assert all(0 <= o < n for o in owners)
    assert owners == sorted(owners)


def test_domain_endpoints_every_n(spark):
    """rating=0 → fragment 0 and rating=5 → fragment n-1 for all n
    (the reference's absorb rule, Interface1.py:129)."""
    for n in range(1, 33):
        assert range_owner_fragment(0.0, n, 0.0, 5.0) == 0
        assert range_owner_fragment(5.0, n, 0.0, 5.0) == n - 1


def test_bucket_expr_matches_python_rule(spark):
    """THE routing invariant: the Spark partitioning expression and the
    Python insert-routing rule agree exactly — same IEEE divide + ceil —
    on a dense boundary-heavy grid, for several fragment counts."""
    from database_fragmentation_and_query_processor_spark.operators.fragmentation import (
        range_fragment_expr,
    )

    vals = sorted(
        {round(i * 0.05, 2) for i in range(101)}
        | {i * 5.0 / n for n in (1, 2, 3, 5, 7, 13) for i in range(n + 1)}
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "rating double")
    for n in (1, 2, 3, 5, 7, 13):
        got = {
            r["rating"]: r["f"]
            for r in df.withColumn(
                "f", range_fragment_expr(F.col("rating"), n, 0.0, 5.0)
            ).collect()
        }
        for v in vals:
            assert got[v] == range_owner_fragment(v, n, 0.0, 5.0), (v, n)
