"""Horizontal fragmentation as computed partition columns.

The reference materializes fragments as physical tables
``range_ratings_part{i}`` / ``round_robin_ratings_part{i}``
(Interface1.py:119-120, 166-167) by pulling the WHOLE relation into
client Python memory and looping (Interface1.py:115-116 — its
scalability cliff). Here a fragment is a value of a computed
``fragment_id`` column and the dataset is written
``partitionBy("fragment_id")`` — directory-per-fragment mirrors
table-per-fragment and buys Catalyst partition pruning at file-listing
time. No driver-side materialization anywhere.

Boundary semantics (THE load-bearing invariant, Interface1.py:122-140):
domain fixed at [min_value, max_value] regardless of data; interval =
(max-min)/n; fragment 0 owns the CLOSED interval [min, min+interval];
every fragment i>0 owns the half-open (min + i*interval,
min + (i+1)*interval]; the last fragment absorbs the exact upper bound.

Round-robin semantics (Interface1.py:169-174): row k in scan order goes
to fragment k mod n; a persisted cursor continues the rotation for later
single-row inserts (Interface1.py:176-177, 205).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import FRAGMENT_COL


def range_fragment_expr(
    value: Column,
    n: int,
    min_value: float = 0.0,
    max_value: float = 5.0,
) -> Column:
    """Fixed-domain bucket expression reproducing Interface1.py:127-137.

    Closed-closed for fragment 0, open-closed after, last bucket absorbs
    ``max_value``. A pure column expression → stays inside whole-stage
    codegen; scales as a narrow transformation.

    NOT ``repartitionByRange``: that samples data-driven boundaries; the
    reference's boundaries are fixed by the domain, not the data.
    """
    interval = (max_value - min_value) / n
    shifted = value - F.lit(min_value)
    bucket = F.when(shifted <= F.lit(interval), F.lit(0)).otherwise(
        F.ceil(shifted / F.lit(interval)).cast("int") - 1
    )
    return F.least(F.greatest(bucket, F.lit(0)), F.lit(n - 1)).cast("int")


def with_row_index(df: DataFrame, name: str = "_row_idx") -> DataFrame:
    """Stable 0-based global row index in current partition/row order.

    KEYLESS FALLBACK ONLY: ``zipWithIndex`` pickles every row through
    Python workers and back — at 100 TB that round-trip dominates.
    Prefer ``assign_round_robin_fragments(order_cols=[...])``, which
    numbers rows JVM-side via ``scaling.stable_row_number``; use this
    path only when no stable key exists and the *physical* scan order
    must be preserved (the reference's Interface1.py:169 assumption:
    ``SELECT *`` order == insertion order).
    """
    spark = df.sparkSession
    schema = df.schema
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(list(schema.fields) + [StructField(name, LongType(), False)])
    return spark.createDataFrame(rdd, out_schema)


def round_robin_fragment_expr(row_index: Column, n: int, start: int = 0) -> Column:
    """fragment = (start + row_index) % n  (Interface1.py:171-174, 205)."""
    return ((row_index + F.lit(start)) % F.lit(n)).cast("int")


def assign_range_fragments(
    df: DataFrame,
    value_col: str,
    n: int,
    min_value: float = 0.0,
    max_value: float = 5.0,
) -> DataFrame:
    return df.withColumn(
        FRAGMENT_COL, range_fragment_expr(F.col(value_col), n, min_value, max_value)
    )


def assign_round_robin_fragments(
    df: DataFrame, n: int, start: int = 0, order_cols: list[str] | None = None
) -> DataFrame:
    """Deterministic (row k → k mod n) assignment.

    The reference's test oracle demands exact ``(rownum-1) % n``
    (testHelper1.py:95-99) — an oracle on per-fragment COUNTS, which any
    deterministic bijective numbering satisfies (fragment i always
    receives ``|{k < total : k ≡ i (mod n)}|`` rows). So Spark's
    non-deterministic ``repartition(n)`` is NOT usable, but the
    numbering ORDER is free to be any stable total order.

    When ``order_cols`` (a unique key) is given, rows are numbered with
    ``scaling.stable_row_number`` — bucketed, JVM-side, no global sort,
    no Python round-trip: the 100 TB path. Without a key, falls back to
    ``with_row_index`` (zipWithIndex) to preserve physical scan order —
    documented as the keyless fallback only.
    """
    if order_cols:
        from .scaling import stable_row_number

        with_idx = stable_row_number(df, order_cols, out_col="_row_idx")
    else:
        with_idx = with_row_index(df, "_row_idx")
    return with_idx.withColumn(
        FRAGMENT_COL, round_robin_fragment_expr(F.col("_row_idx"), n, start)
    ).drop("_row_idx")


def write_fragmented(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize a fragmented dataset: directory-per-fragment parquet.

    ``fragment_id`` becomes the physical partition column, so any filter
    on it becomes partition pruning (file-listing-level skip) — the Spark
    analogue of the reference's manual selectMode fragment walk
    (Interface1.py:273-290).
    """
    df.write.mode(mode).partitionBy(FRAGMENT_COL).parquet(path)


def hash_fragment_expr(key: Column, n: int) -> Column:
    """[EXT] Hash-routing expression — the third classic fragmentation
    scheme next to the reference's range (Interface1.py:101-148) and
    round-robin (:150-181). The hash is md5-derived 53-bit arithmetic
    (the repo-wide portable-hash convention, functions/text.py:
    token_hash) rather than an engine-native hash(), so routing is
    reproducible across engines and versions — a re-run or an oracle
    can verify fragment membership bit-for-bit."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 13), 16, 10).cast("bigint")
    return (h % F.lit(n)).cast("int")


def assign_hash_fragments(df: DataFrame, key_col: str, n: int) -> DataFrame:
    return df.withColumn(FRAGMENT_COL, hash_fragment_expr(F.col(key_col), n))
