"""Time-partitioned event storage: partition pruning, edge trimming,
retention drops."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark import entry_queries as EQ
from database_fragmentation_and_query_processor_spark.operators.timeseries import (
    drop_before,
    read_time_range,
    write_time_partitioned,
)
from database_fragmentation_and_query_processor_spark.plans import partition_filters


def _write(spark, sf_dir, tmp_path) -> str:
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(EQ._events(spark, sf_dir), path)
    return path


def test_time_range_matches_unpartitioned_filter(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    ev = EQ._events(spark, sf_dir)
    bounds = ev.agg(F.min("event_time").alias("lo")).head()
    lo = bounds["lo"]
    lo_s = lo.strftime("%Y-%m-%d %H:%M:%S")
    hi = lo.replace(hour=0, minute=0, second=0, microsecond=0)
    import datetime

    hi_s = (hi + datetime.timedelta(days=2, hours=6)).strftime("%Y-%m-%d %H:%M:%S")
    got = read_time_range(spark, path, lo_s, hi_s)
    want = ev.where(
        (F.col("event_time") >= F.lit(lo_s).cast("timestamp"))
        & (F.col("event_time") < F.lit(hi_s).cast("timestamp"))
    )
    assert got.count() == want.count() > 0
    assert sorted(r.event_id for r in got.select("event_id").collect()) == sorted(
        r.event_id for r in want.select("event_id").collect()
    )


def test_time_range_prunes_partitions(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    df = read_time_range(spark, path, "2024-01-02 00:00:00", "2024-01-04 00:00:00")
    pf = " ".join(partition_filters(df))
    assert "p_day" in pf, f"day bound must reach PartitionFilters: {pf}"


def test_retention_drop_before(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    days = sorted(
        str(r.p_day)
        for r in spark.read.parquet(path).select("p_day").distinct().collect()
    )
    assert len(days) >= 3
    cutoff = days[2]
    dropped = drop_before(spark, path, cutoff)
    assert len(dropped) == 2
    left = sorted(
        str(r.p_day)
        for r in spark.read.parquet(path).select("p_day").distinct().collect()
    )
    assert left == days[2:]
