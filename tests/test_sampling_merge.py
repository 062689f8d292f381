"""Unit tests for the deterministic-sampling and merge-upsert operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.operators import merge as M
from database_fragmentation_and_query_processor_spark.operators import sampling as S


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(2000).select(
        S.hash_bucket(F.col("id"), salt="t").alias("b")
    )
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"),
        F.countDistinct("b").alias("nd"),
    ).first()
    assert 0 <= stats.lo and stats.hi < S.HASH_BUCKETS
    # uniform expectation for 2000 draws over 1000 buckets is
    # 1000 * (1 - e^-2) ~= 864 distinct
    assert stats.nd > 820
    # same salt+key → same bucket on a differently-partitioned plan
    again = (
        spark.range(2000).repartition(7)
        .select("id", S.hash_bucket(F.col("id"), salt="t").alias("b2"))
    )
    base = spark.range(2000).select(
        "id", S.hash_bucket(F.col("id"), salt="t").alias("b1")
    )
    assert base.join(again, "id").where(F.col("b1") != F.col("b2")).count() == 0


def test_deterministic_sample_fraction_and_subset(spark):
    df = spark.range(10_000)
    s = S.deterministic_sample(df, F.col("id"), rate_permille=200, salt="x")
    n = s.count()
    assert abs(n / 10_000 - 0.2) < 0.03
    # sample is a strict subset and re-running yields identical rows
    s2 = S.deterministic_sample(df, F.col("id"), rate_permille=200, salt="x")
    assert s.exceptAll(s2).count() == 0 and s2.exceptAll(s).count() == 0
    # nested rates: a 100-permille sample with the same salt is a subset
    # of the 200-permille one (threshold semantics, not independent draws)
    s_small = S.deterministic_sample(df, F.col("id"), rate_permille=100, salt="x")
    assert s_small.exceptAll(s).count() == 0


def test_stratified_sample_rates(spark):
    df = spark.range(9_000).withColumn(
        "stratum",
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c"),
    )
    s = S.stratified_sample(
        df, F.col("id"), F.col("stratum"),
        rates_permille={"a": 600, "b": 100}, default_permille=0, salt="y",
    )
    got = {r["stratum"]: r["n"] for r in
           s.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert abs(got["a"] / 3000 - 0.6) < 0.05
    assert abs(got["b"] / 3000 - 0.1) < 0.04
    assert "c" not in got  # default 0 permille drops the stratum


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    upd = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double"
    )
    out = {r["k"]: (r["v"], r["x"]) for r in
           M.merge_upsert(base, upd, key_cols=["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_tiebreak_within_updates(spark):
    base = spark.createDataFrame([(1, 0, "old")], "k int, ver int, v string")
    upd = spark.createDataFrame(
        [(1, 1, "mid"), (1, 2, "new")], "k int, ver int, v string"
    )
    out = M.merge_upsert(base, upd, key_cols=["k"], tiebreak_cols=["ver"]).collect()
    assert len(out) == 1 and out[0]["v"] == "new" and out[0]["ver"] == 2


def test_apply_cdc_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (4, "d", "I")], "k int, v string, op string"
    )
    out = {r["k"]: r["v"] for r in
           M.apply_cdc(base, changes, key_cols=["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_apply_cdc_same_batch_tie_is_deterministic(spark):
    """No version_col + several changes to one key in a batch: the
    survivor must be identical across runs and partitionings (op-code
    then payload-hash tie-breaks), never partition luck."""
    base = spark.createDataFrame([(1, "old")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, "x", "U"), (1, "y", "U"), (1, "z", "I")], "k int, v string, op string"
    )
    winners = set()
    for nparts in (1, 2, 7):
        out = M.apply_cdc(
            base, changes.repartition(nparts), key_cols=["k"]
        ).collect()
        assert len(out) == 1
        winners.add(out[0]["v"])
    assert len(winners) == 1, winners


def test_apply_cdc_latest_change_wins_by_version(spark):
    base = spark.createDataFrame([(1, "old", 0)], "k int, v string, ver int")
    # delete at ver 1, re-insert at ver 2 → the re-insert survives;
    # key 2 updated at ver 1 then deleted at ver 2 → gone
    changes = spark.createDataFrame(
        [(1, "gone", 1, "D"), (1, "back", 2, "I"),
         (2, "upd", 1, "U"), (2, "x", 2, "D")],
        "k int, v string, ver int, op string",
    )
    out = {r["k"]: (r["v"], r["ver"]) for r in
           M.apply_cdc(base, changes, key_cols=["k"], version_col="ver").collect()}
    assert out == {1: ("back", 2)}


def test_scd2_history_intervals(spark):
    from database_fragmentation_and_query_processor_spark.operators.merge import scd2_history

    versions = spark.createDataFrame(
        [(1, 10.0, 0), (1, 12.0, 1), (1, 13.0, 2), (2, 5.0, 0)],
        "k long, v double, ver long",
    )
    out = {(r.k, r.valid_from): (r.valid_to, r.is_current)
           for r in scd2_history(versions, ["k"], "ver").collect()}
    assert out[(1, 0)] == (1, False)
    assert out[(1, 1)] == (2, False)
    assert out[(1, 2)] == (None, True)
    assert out[(2, 0)] == (None, True)
