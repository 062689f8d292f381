"""Pruned range / point queries over fragmented datasets.

Reference semantics (Interface1.py:261-347):

- ``rangeQuery(min, max)``: on the RANGE scheme, scan ONLY the fragments
  whose interval intersects [min, max] (manual selectMode walk +
  early break, Interface1.py:273-290), filter ``rating >= min AND
  rating <= max`` (inclusive both ends), ORDER BY rating per fragment,
  and prefix each row with its source-fragment name (provenance). On the
  ROUND-ROBIN scheme, scan ALL fragments with the same filter, no order.
  Concatenate range-side-first. A row matching in both schemes appears
  TWICE — once per scheme (golden rangeResult.txt:3 vs :12).

- ``pointQuery(v)``: same, but the range side touches exactly the ONE
  owning fragment (Interface1.py:323-331).

Spark translation: the manual fragment walk becomes a predicate on the
``fragment_id`` partition column → Catalyst file-listing partition
pruning; the per-fragment SQL unification becomes a single scan; the
rating filter is pushed into the parquet scan (row-group min/max skip).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import FragmentCatalog
from ..schema import FRAGMENT_COL, RANGE_PREFIX, RR_PREFIX


def range_owner_fragment(
    value: float, n: int, min_value: float, max_value: float
) -> int:
    """Python-side owner computation, same closed/open rule as the column
    expression (Interface1.py:242-247 recomputes interval the same way)."""
    interval = (max_value - min_value) / n
    shifted = value - min_value
    if shifted <= interval:
        return 0
    return min(max(math.ceil(shifted / interval) - 1, 0), n - 1)


def _provenance(prefix: str) -> F.Column:
    return F.concat(F.lit(prefix), F.col(FRAGMENT_COL).cast("string")).alias(
        "fragment_name"
    )


def range_query(
    spark: SparkSession,
    min_rating: float,
    max_rating: float,
    warehouse: str,
    range_path: str,
    rr_path: str,
) -> DataFrame:
    """Both-scheme range query with provenance + duplicate emission."""
    cat = FragmentCatalog(warehouse)
    parts = []

    rmeta = cat.range_meta()
    if rmeta.n > 0:
        lo = range_owner_fragment(min_rating, rmeta.n, rmeta.min_value, rmeta.max_value)
        hi = range_owner_fragment(max_rating, rmeta.n, rmeta.min_value, rmeta.max_value)
        rng = (
            spark.read.parquet(range_path)
            # fragment_id predicate → partition pruning (dir-level skip),
            # the Spark analogue of the selectMode walk.
            .where(F.col(FRAGMENT_COL).between(lo, hi))
            .where(F.col("rating").between(min_rating, max_rating))
            # range side is rating-ascending per fragment; fragment-major
            # then rating reproduces the reference's concatenated order.
            .orderBy(FRAGMENT_COL, "rating")
            .select(_provenance(RANGE_PREFIX), "userid", "movieid", "rating")
        )
        parts.append(rng)

    rrmeta = cat.round_robin_meta()
    if rrmeta.n > 0:
        rr = (
            spark.read.parquet(rr_path)
            .where(F.col("rating").between(min_rating, max_rating))
            # reference scans RR fragments in ascending order
            # (Interface1.py:293-298); no intra-fragment order.
            .orderBy(FRAGMENT_COL)
            .select(_provenance(RR_PREFIX), "userid", "movieid", "rating")
        )
        parts.append(rr)

    if not parts:
        return spark.createDataFrame(
            [], "fragment_name string, userid int, movieid int, rating double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def point_query(
    spark: SparkSession,
    rating_value: float,
    warehouse: str,
    range_path: str,
    rr_path: str,
) -> DataFrame:
    """Both-scheme equality query; range side touches exactly 1 fragment.

    Float equality is exact here: the rating domain is halves 0.0-5.0
    (FIXTURES.md §1), all representable in binary doubles.
    """
    cat = FragmentCatalog(warehouse)
    parts = []

    rmeta = cat.range_meta()
    if rmeta.n > 0:
        owner = range_owner_fragment(
            rating_value, rmeta.n, rmeta.min_value, rmeta.max_value
        )
        rng = (
            spark.read.parquet(range_path)
            .where(F.col(FRAGMENT_COL) == owner)  # single-partition pruned read
            .where(F.col("rating") == rating_value)
            .select(_provenance(RANGE_PREFIX), "userid", "movieid", "rating")
        )
        parts.append(rng)

    rrmeta = cat.round_robin_meta()
    if rrmeta.n > 0:
        rr = (
            spark.read.parquet(rr_path)
            .where(F.col("rating") == rating_value)
            .select(_provenance(RR_PREFIX), "userid", "movieid", "rating")
        )
        parts.append(rr)

    if not parts:
        return spark.createDataFrame(
            [], "fragment_name string, userid int, movieid int, rating double"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def write_result_file(df: DataFrame, output_path: str) -> int:
    """Reference-format sink: comma-joined ``str()`` rendering, one file
    (Interface1.py:300-304). Streams via toLocalIterator — never a full
    collect; intended for human-sized results like the golden files.
    For bulk extracts use ``df.write.csv`` instead.
    """
    n = 0
    with open(output_path, "w") as f:
        for row in df.toLocalIterator():
            f.write(",".join(_render(v) for v in row) + "\n")
            n += 1
    return n


def _render(v) -> str:
    if isinstance(v, float):
        return repr(v)  # 2.0-style, matches Python str() used at Interface1.py:300
    return str(v)
