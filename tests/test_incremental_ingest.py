"""Exactly-once semantics of the incremental file-ledger ingest
(sources/incremental.py): new-file detection, rewrite detection,
crash-retry idempotence."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.sources.incremental import (
    commit_ingest,
    ingest_increment,
    new_files,
)


def _drop(spark, path, ids):
    df = spark.createDataFrame([(i, f"v{i}") for i in ids], "id bigint, v string")
    df.coalesce(1).write.mode("overwrite").parquet(path + ".stage")
    part = [f for f in os.listdir(path + ".stage") if f.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(os.path.join(path + ".stage", part), path)


def test_incremental_rounds_are_exactly_once(spark, tmp_path):
    data = str(tmp_path / "drop")
    ledger = str(tmp_path / "ledger")
    os.makedirs(data)

    # round 1: two files arrive
    _drop(spark, os.path.join(data, "a.parquet"), [1, 2])
    _drop(spark, os.path.join(data, "b.parquet"), [3])
    df, idents = ingest_increment(spark, data, ledger)
    assert sorted(os.path.basename(i.path) for i in idents) == [
        "a.parquet",
        "b.parquet",
    ]
    assert df.count() == 3
    commit_ingest(ledger, idents)

    # round 2: nothing new
    df2, idents2 = ingest_increment(spark, data, ledger)
    assert df2 is None and idents2 == []

    # round 3: one new file + one REWRITTEN file re-ingests
    _drop(spark, os.path.join(data, "c.parquet"), [4, 5])
    time.sleep(0.01)  # ensure mtime_ns moves on coarse filesystems
    _drop(spark, os.path.join(data, "a.parquet"), [1, 2, 9])
    got = sorted(os.path.basename(i.path) for i in new_files(data, ledger))
    assert got == ["a.parquet", "c.parquet"]
    df3, idents3 = ingest_increment(spark, data, ledger)
    assert df3.agg(F.sum("id")).head()[0] == (1 + 2 + 9) + (4 + 5)
    commit_ingest(ledger, idents3)
    assert new_files(data, ledger) == []


def test_rewrite_between_read_and_commit_reingests(spark, tmp_path):
    """The ledger records the identity captured at LISTING time: a file
    rewritten after ingest_increment read it but before commit_ingest
    is detected as changed on the next round (the r4 advisor's
    re-stat-at-commit bug would record the new identity against the old
    content and skip the rewrite forever)."""
    data = str(tmp_path / "drop")
    ledger = str(tmp_path / "ledger")
    os.makedirs(data)
    _drop(spark, os.path.join(data, "a.parquet"), [1, 2])
    df, idents = ingest_increment(spark, data, ledger)
    assert df.count() == 2
    # file rewritten IN BETWEEN read and commit
    time.sleep(0.01)
    _drop(spark, os.path.join(data, "a.parquet"), [7, 8, 9])
    commit_ingest(ledger, idents)
    # next round must see the rewritten content as new
    fresh = new_files(data, ledger)
    assert [os.path.basename(i.path) for i in fresh] == ["a.parquet"]
    df2, idents2 = ingest_increment(spark, data, ledger)
    assert df2.agg(F.sum("id")).head()[0] == 7 + 8 + 9
    commit_ingest(ledger, idents2)
    assert new_files(data, ledger) == []


def test_crash_before_commit_retries_same_files(spark, tmp_path):
    data = str(tmp_path / "drop")
    ledger = str(tmp_path / "ledger")
    os.makedirs(data)
    _drop(spark, os.path.join(data, "a.parquet"), [1])
    # run 1 reads but crashes before commit_ingest → ledger unchanged
    _, idents = ingest_increment(spark, data, ledger)
    assert len(idents) == 1
    # retry sees the SAME file again (at-least-once), commit closes it
    _, retry_idents = ingest_increment(spark, data, ledger)
    assert retry_idents == idents
    commit_ingest(ledger, retry_idents)
    assert new_files(data, ledger) == []
