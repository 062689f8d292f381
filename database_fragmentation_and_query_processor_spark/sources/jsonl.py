"""JSON-lines source/sink.

The reference reads only ``::``-delimited text (Interface1.py:23-34);
this is the [EXT] semi-structured path a data pipeline needs: schema'd
ndjson in, ndjson out, plus a permissive-mode reader that quarantines
corrupt records instead of failing the job (at 100 TB there WILL be
corrupt lines; dropping them silently or dying are both wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema'd ndjson scan. With ``keep_corrupt`` the corrupt lines are
    retained in ``_corrupt_record`` (PERMISSIVE mode) so a pipeline can
    route them to a quarantine sink; otherwise they are dropped
    (DROPMALFORMED)."""
    if keep_corrupt:
        full = StructType(
            schema.fields + [StructField(CORRUPT_COL, StringType())]
        )
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a keep_corrupt read. The parsed frame is
    cached first: Spark disallows queries that reference ONLY the
    internal corrupt-record column of a raw JSON scan (SPARK-21610),
    and both outputs scan the same parse anyway."""
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
