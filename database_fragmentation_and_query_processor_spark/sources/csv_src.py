"""CSV source/sink with corrupt-record quarantine.

Completes the delimited-text family next to the reference's ``::`` scan
(``sources/ratings.py``, Interface1.py:23-34) and the ndjson path
(``sources/jsonl.py``): schema'd CSV in, CSV out, and a permissive
reader that routes malformed lines to a quarantine frame instead of
failing the scan — at 100 TB a malformed line is an operational
certainty, and both silently dropping it and dying are wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema'd CSV scan (never inferSchema: a schema inference pass
    reads the whole input TWICE at scale and can flip types between
    runs). With ``keep_corrupt`` malformed lines are retained in
    ``_corrupt_record`` (PERMISSIVE) for quarantine routing; otherwise
    they are dropped (DROPMALFORMED)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("enforceSchema", "true")
    )
    if keep_corrupt:
        full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
        return (
            reader.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path)
        )
    return reader.schema(schema).option("mode", "DROPMALFORMED").csv(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a keep_corrupt read; cached once since
    both outputs share the parse (and Spark disallows referencing only
    the internal corrupt-record column of a raw scan, SPARK-21610)."""
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
