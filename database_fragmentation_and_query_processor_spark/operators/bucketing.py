"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
the shuffle of both sides on the join key. Bucketing pays that shuffle
ONCE at write time: both tables are written with ``bucketBy(n, key)``
(+ ``sortBy`` to also pre-sort runs), after which every join on the
bucket key is planned as a SortMergeJoin with NO Exchange on either
side — each task reads bucket i of both tables. The same mechanism
serves repeated aggregations on the bucket key.

Requirements Spark enforces (and tests assert): equal bucket counts on
both sides, join key == bucket key, ``spark.sql.sources.bucketing.enabled``
(default true). ``saveAsTable`` is required — bucket metadata lives in
the catalog, not in plain parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. ``path`` makes it external (data outside the warehouse)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_key)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planned without
    a shuffle on either side (see tests/test_bucketing.py, which
    asserts zero Exchange operators in the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), key)
