"""Fragmentation-property tests ported from the reference's hand-rolled
driver (testHelper1.py styles 2-5 per SURVEY.md §5): row-count oracle,
completeness/disjointness/reconstruction triple, independent
re-implementation oracles, insert-routing expectations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark import api
from database_fragmentation_and_query_processor_spark.catalog import FragmentCatalog
from database_fragmentation_and_query_processor_spark.operators.fragmentation import (
    range_fragment_expr,
)
from database_fragmentation_and_query_processor_spark.schema import FRAGMENT_COL

from .conftest import RATINGS_FIXTURE

N = 5  # fragment count used throughout the reference tests (tester1.py)


@pytest.fixture()
def loaded(spark, ratings_file, warehouse):
    df = api.load_ratings(spark, "ratings", ratings_file, warehouse)
    return df, warehouse


def test_load_row_count_and_schema(loaded):
    df, _ = loaded
    assert df.count() == len(RATINGS_FIXTURE)  # ACTUAL_ROWS_IN_INPUT_FILE
    assert [f.name for f in df.schema.fields] == ["userid", "movieid", "rating"]
    rows = {(r.userid, r.movieid, r.rating) for r in df.collect()}
    assert rows == set(RATINGS_FIXTURE)


def _expected_range_fragment(rating: float, n: int = N) -> int:
    interval = 5.0 / n
    if rating <= interval:
        return 0
    return min(math.ceil(rating / interval) - 1, n - 1)


def test_range_partition_counts_match_independent_oracle(spark, loaded):
    df, warehouse = loaded
    api.range_partition(spark, "ratings", N, warehouse)
    frags = spark.read.parquet(f"{warehouse}/ratings_range")
    got = {
        r[FRAGMENT_COL]: r["cnt"]
        for r in frags.groupBy(FRAGMENT_COL).agg(F.count("*").alias("cnt")).collect()
    }
    expected: dict[int, int] = {}
    for _, _, rating in RATINGS_FIXTURE:
        k = _expected_range_fragment(rating)
        expected[k] = expected.get(k, 0) + 1
    assert got == expected


def test_range_partition_property_triple(spark, loaded):
    df, warehouse = loaded
    api.range_partition(spark, "ratings", N, warehouse)
    frags = spark.read.parquet(f"{warehouse}/ratings_range")
    n_base = df.count()
    # completeness + disjointness + reconstruction == exact count match
    assert frags.count() == n_base
    # reconstruction: same multiset of tuples
    assert (
        frags.select("userid", "movieid", "rating")
        .exceptAll(df)
        .count() == 0
    )
    # every fragment id within [0, N)
    ids = {r[0] for r in frags.select(FRAGMENT_COL).distinct().collect()}
    assert ids <= set(range(N))


def test_round_robin_partition_matches_rownum_mod_oracle(spark, loaded):
    df, warehouse = loaded
    api.round_robin_partition(spark, "ratings", N, warehouse)
    frags = spark.read.parquet(f"{warehouse}/ratings_rr")
    assert frags.count() == len(RATINGS_FIXTURE)
    # counts per fragment must be exactly (rownum-1) % N of 20 rows → 4 each
    got = {
        r[FRAGMENT_COL]: r["cnt"]
        for r in frags.groupBy(FRAGMENT_COL).agg(F.count("*").alias("cnt")).collect()
    }
    assert got == {i: len(RATINGS_FIXTURE) // N for i in range(N)}
    # cursor persisted: 20 rows → last index 19 → 19 % 5 = 4
    assert FragmentCatalog(warehouse).round_robin_meta().last_inserted == (
        len(RATINGS_FIXTURE) - 1
    ) % N


def test_invalid_partition_count_is_noop(spark, loaded):
    df, warehouse = loaded
    for bad in (0, -1, 1.5, "5", None, True):
        api.range_partition(spark, "ratings", bad, warehouse)
        api.round_robin_partition(spark, "ratings", bad, warehouse)
    assert FragmentCatalog(warehouse).range_meta().n == 0
    assert FragmentCatalog(warehouse).round_robin_meta().n == 0


def test_range_insert_routing(spark, loaded):
    """tester1.py:39 — rating 3 routes to range fragment 2 (of 5)."""
    df, warehouse = loaded
    api.range_partition(spark, "ratings", N, warehouse)
    api.range_insert(spark, "ratings", 100, 2, 3.0, warehouse)
    frags = spark.read.parquet(f"{warehouse}/ratings_range")
    hit = frags.where(
        (F.col("userid") == 100) & (F.col("movieid") == 2) & (F.col("rating") == 3.0)
    ).collect()
    assert len(hit) == 1 and hit[0][FRAGMENT_COL] == 2
    base = spark.read.parquet(f"{warehouse}/ratings/base")
    assert base.count() == len(RATINGS_FIXTURE) + 1


def test_round_robin_insert_routing_and_cursor(spark, loaded):
    """tester1.py:51 — first RR insert after a 20-row/5-part partition
    goes to fragment 0; cursor advances."""
    df, warehouse = loaded
    api.round_robin_partition(spark, "ratings", N, warehouse)
    api.round_robin_insert(spark, "ratings", 100, 1, 3.0, warehouse)
    frags = spark.read.parquet(f"{warehouse}/ratings_rr")
    hit = frags.where((F.col("userid") == 100) & (F.col("movieid") == 1)).collect()
    assert len(hit) == 1 and hit[0][FRAGMENT_COL] == 0
    api.round_robin_insert(spark, "ratings", 101, 1, 3.0, warehouse)
    hit2 = (
        spark.read.parquet(f"{warehouse}/ratings_rr")
        .where(F.col("userid") == 101)
        .collect()
    )
    assert len(hit2) == 1 and hit2[0][FRAGMENT_COL] == 1
    assert FragmentCatalog(warehouse).round_robin_meta().last_inserted == 1


def test_bucket_expr_hits_every_boundary(spark):
    """Exhaustive check of the closed/open rule on all 11 half-step
    values (incl. rating==0 → fragment 0 and rating==5 → last-bucket
    absorb), for several n."""
    vals = [i / 2 for i in range(11)]
    df = spark.createDataFrame([(v,) for v in vals], "rating double")
    for n in (2, 3, 5, 7):
        got = {
            r["rating"]: r["frag"]
            for r in df.select(
                "rating", range_fragment_expr(F.col("rating"), n).alias("frag")
            ).collect()
        }
        exp = {v: _expected_range_fragment(v, n) for v in vals}
        assert got == exp, f"n={n}"


def test_hash_partition_complete_disjoint_and_routed(spark, ratings_file, warehouse):
    """[EXT] hash scheme: fragments are complete + disjoint, routing is
    the portable md5 arithmetic, and inserts land in the owning
    fragment."""
    from pyspark.sql import functions as F

    from database_fragmentation_and_query_processor_spark import api
    from database_fragmentation_and_query_processor_spark.schema import FRAGMENT_COL

    base = api.load_ratings(spark, "ratings", ratings_file, warehouse)
    total = base.count()
    api.hash_partition(spark, "ratings", 4, warehouse)
    fragged = spark.read.parquet(f"{warehouse}/ratings_hash")
    assert fragged.count() == total
    # disjoint: every (userid, movieid) appears exactly once
    assert fragged.select("userid", "movieid").distinct().count() == total
    # all rows of one user share a fragment (routing is key-functional)
    per_user = fragged.groupBy("userid").agg(
        F.countDistinct(FRAGMENT_COL).alias("nf")
    )
    assert per_user.where(F.col("nf") > 1).count() == 0

    api.hash_insert(spark, "ratings", 999, 123, 2.5, warehouse)
    hit = api.hash_key_lookup(spark, 999, warehouse)
    rows = hit.collect()
    assert len(rows) == 1 and rows[0]["movieid"] == 123


def test_hash_key_lookup_prunes_partitions(spark, ratings_file, warehouse):
    from database_fragmentation_and_query_processor_spark import api
    from database_fragmentation_and_query_processor_spark.plans import partition_filters

    api.load_ratings(spark, "ratings", ratings_file, warehouse)
    api.hash_partition(spark, "ratings", 4, warehouse)
    df = api.hash_key_lookup(spark, 1, warehouse)
    pf = " ".join(partition_filters(df))
    assert "fragment_id" in pf, pf
