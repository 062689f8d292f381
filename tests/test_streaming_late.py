"""Watermark semantics: late rows beyond the watermark horizon are
dropped from windowed streaming aggregates.

Micro-batch sequencing is forced with maxFilesPerTrigger=1 over two
parquet files (the file source lists lexicographically), in append
output mode so only watermark-finalized windows are emitted.
"""

from __future__ import annotations

import glob
import shutil
import uuid

from pyspark.sql import functions as F

H = 3_600_000_000  # 1h in micros
T0 = 1_600_000_000_000_000  # aligned base (divisible by 1h)


def _write(spark, tmp_path, src, name, micros):
    """Stage a single flat parquet FILE (the streaming file source does
    not recurse into write.parquet's output directories)."""
    stage = str(tmp_path / f"stage_{name}")
    spark.createDataFrame([(m,) for m in micros], "tus long").coalesce(1)\
        .write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, f"{src}/{name}.parquet")


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    import os
    os.makedirs(src, exist_ok=True)
    # batch 1: two rows in the hour-0 window, one two hours later →
    # after this batch the watermark advances to (T0+2h) - 1h
    _write(spark, tmp_path, src, "b0", [T0 + 60, T0 + 120, T0 + 2 * H])

    stream = (
        spark.readStream.schema("tus long")
        .parquet(src)
        .withColumn("event_time", F.timestamp_micros(F.col("tus")))
    )
    agg = (
        stream.withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("start"), "n")
    )
    name = "late" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()  # batch 1 (watermark still 0 inside it)
        # batch 2: a LATE row back in hour 0 — behind the watermark,
        # must be dropped — plus a fresh row that keeps time moving
        _write(spark, tmp_path, src, "b1", [T0 + 180, T0 + 3 * H])
        q.processAllAvailable()
    finally:
        q.stop()

    win0 = T0 - (T0 % H)  # Spark aligns windows to epoch-hour boundaries
    got = {
        int(r["start"].timestamp() * 1_000_000): r["n"]
        for r in spark.table(name).collect()
    }
    # hour-0 window finalized with ONLY the 2 on-time rows — the late
    # third row arrived behind the watermark and was dropped
    assert got.get(win0) == 2, got
    # later windows stay open (watermark never passes their ends), so
    # append mode must not have emitted them
    assert all(k == win0 for k in got), got
