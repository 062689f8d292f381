"""MovieLens ``::``-delimited ratings reader.

Reference: ``loadRatings`` reads line-by-line, splits on ``'::'``, keeps
fields 0-2 and DROPS the timestamp (Interface1.py:23-34) — one INSERT
round-trip per row. Here it is one distributed CSV scan with a
multi-char separator (Spark >= 3 supports ``sep=':: '``-style strings)
projected down to the 3 logical columns; Catalyst prunes the timestamp
column at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import RATINGS_RAW_SCHEMA


def read_ratings_text(spark: SparkSession, path: str) -> DataFrame:
    """Read ``userid::movieid::rating::timestamp`` lines → 3-col ratings."""
    raw = (
        spark.read.option("sep", "::")
        .schema(RATINGS_RAW_SCHEMA)
        .csv(path)
    )
    return raw.select("userid", "movieid", "rating")


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load driver testdata parquet tables by name."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
