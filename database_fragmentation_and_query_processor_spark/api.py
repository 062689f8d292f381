"""Reference-shaped facade.

One function per reference entry point (Interface1.py), with
``SparkSession + warehouse dir`` replacing ``openconnection``:

==============================  =======================================
Reference (Interface1.py)       Here
==============================  =======================================
getOpenConnection / createDB    SparkSession (caller-provided)
loadRatings          :23-34     load_ratings
rangePartition       :101-148   range_partition
roundRobinPartition  :150-181   round_robin_partition
rangeInsert          :215-259   range_insert
roundRobinInsert     :183-213   round_robin_insert
rangeQuery           :261-308   range_query
pointQuery           :310-347   point_query
deleteTables         :372-393   delete_tables
delete_all_partitions :36-47    (implicit: overwrite of partition dirs)
update_*_metadata    :49-98     catalog.FragmentCatalog
==============================  =======================================

Warehouse layout (one directory per logical table)::

    {warehouse}/{table}/base/                      # unfragmented parquet
    {warehouse}/{table}_range/fragment_id=i/       # range scheme
    {warehouse}/{table}_rr/fragment_id=i/          # round-robin scheme
    {warehouse}/_frag_metadata.json                # catalogs + RR cursor

Invalid ``n`` (non-positive / non-int) is a no-op with a message, like
the reference (Interface1.py:103-105).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs as fslib
from .catalog import FragmentCatalog
from .operators import fragmentation as frag
from .operators import query as q
from .schema import FRAGMENT_COL, RATINGS_SCHEMA
from .sources.ratings import read_ratings_text

RATING_DOMAIN = (0.0, 5.0)  # fixed regardless of data (Interface1.py:122-123)


def _base_path(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, table, "base")

def _range_path(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, f"{table}_range")

def _rr_path(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, f"{table}_rr")


def _valid_n(n) -> bool:
    return isinstance(n, int) and not isinstance(n, bool) and n > 0


def load_ratings(
    spark: SparkSession, table: str, filepath: str, warehouse: str
) -> DataFrame:
    """Distributed load of ``::`` text → parquet base table (op #1)."""
    df = read_ratings_text(spark, filepath)
    df.write.mode("overwrite").parquet(_base_path(warehouse, table))
    return spark.read.parquet(_base_path(warehouse, table))


def range_partition(spark: SparkSession, table: str, n, warehouse: str) -> None:
    """Fragment the base table by fixed-domain rating buckets (op #3)."""
    if not _valid_n(n):
        print("Invalid number of partitions:", n)
        return
    lo, hi = RATING_DOMAIN
    df = spark.read.parquet(_base_path(warehouse, table))
    frag.write_fragmented(
        frag.assign_range_fragments(df, "rating", n, lo, hi),
        _range_path(warehouse, table),
    )
    FragmentCatalog(warehouse).update_range(
        n=n, min_value=lo, max_value=hi, interval=(hi - lo) / n
    )


def round_robin_partition(spark: SparkSession, table: str, n, warehouse: str) -> None:
    """Fragment the base table row k → fragment k mod n (op #4)."""
    if not _valid_n(n):
        print("Invalid number of partitions:", n)
        return
    df = spark.read.parquet(_base_path(warehouse, table))
    # (userid, movieid) is the ratings natural key → JVM-side bucketed
    # numbering (operators/scaling.py), no Python RDD round-trip.
    assigned = frag.assign_round_robin_fragments(
        df, n, order_cols=["userid", "movieid"]
    )
    frag.write_fragmented(assigned, _rr_path(warehouse, table))
    total = df.count()
    # cursor = index of the last inserted row mod n (Interface1.py:176-177)
    FragmentCatalog(warehouse).update_round_robin(
        n=n, last_inserted=(total - 1) % n if total else -1
    )


def _new_row(spark: SparkSession, userid: int, itemid: int, rating: float) -> DataFrame:
    return spark.createDataFrame(
        [(int(userid), int(itemid), float(rating))], RATINGS_SCHEMA
    )


def range_insert(
    spark: SparkSession, table: str, userid: int, itemid: int, rating: float,
    warehouse: str,
) -> None:
    """Dual-write: append to base AND to the owning range fragment
    (op #5, Interface1.py:215-259)."""
    row = _new_row(spark, userid, itemid, rating)
    row.write.mode("append").parquet(_base_path(warehouse, table))
    meta = FragmentCatalog(warehouse).range_meta()
    if meta.n <= 0:
        print("There are no range partitions to insert")
        return
    owner = q.range_owner_fragment(rating, meta.n, meta.min_value, meta.max_value)
    row.withColumn(FRAGMENT_COL, F.lit(owner)).write.mode("append").partitionBy(
        FRAGMENT_COL
    ).parquet(_range_path(warehouse, table))


def round_robin_insert(
    spark: SparkSession, table: str, userid: int, itemid: int, rating: float,
    warehouse: str,
) -> None:
    """Dual-write with rotating cursor (op #6, Interface1.py:183-213)."""
    row = _new_row(spark, userid, itemid, rating)
    row.write.mode("append").parquet(_base_path(warehouse, table))
    cat = FragmentCatalog(warehouse)
    meta = cat.round_robin_meta()
    if meta.n <= 0:
        print("There are no round robin partitions to insert")
        return
    owner = (meta.last_inserted + 1) % meta.n
    row.withColumn(FRAGMENT_COL, F.lit(owner)).write.mode("append").partitionBy(
        FRAGMENT_COL
    ).parquet(_rr_path(warehouse, table))
    cat.update_round_robin(last_inserted=owner)


def range_query(
    spark: SparkSession, min_rating: float, max_rating: float, warehouse: str,
    output_path: str | None = None, table: str = "ratings",
) -> DataFrame:
    df = q.range_query(
        spark, min_rating, max_rating, warehouse,
        _range_path(warehouse, table), _rr_path(warehouse, table),
    )
    if output_path:
        q.write_result_file(df, output_path)
    return df


def point_query(
    spark: SparkSession, rating_value: float, warehouse: str,
    output_path: str | None = None, table: str = "ratings",
) -> DataFrame:
    df = q.point_query(
        spark, rating_value, warehouse,
        _range_path(warehouse, table), _rr_path(warehouse, table),
    )
    if output_path:
        q.write_result_file(df, output_path)
    return df


def _hash_path(warehouse: str, table: str) -> str:
    return os.path.join(warehouse, f"{table}_hash")


def hash_partition(
    spark: SparkSession, table: str, n, warehouse: str, key: str = "userid"
) -> None:
    """[EXT] Fragment the base table by portable hash of ``key`` — the
    third classic scheme (no reference counterpart). Same warehouse
    layout and partition-pruned reads as the range/RR schemes."""
    if not _valid_n(n):
        print("Invalid number of partitions:", n)
        return
    df = spark.read.parquet(_base_path(warehouse, table))
    frag.write_fragmented(
        frag.assign_hash_fragments(df, key, n), _hash_path(warehouse, table)
    )
    FragmentCatalog(warehouse).update_hash(n=n, key=key)


def hash_insert(
    spark: SparkSession, table: str, userid: int, itemid: int, rating: float,
    warehouse: str,
) -> None:
    """[EXT] Dual-write routed by the catalog's hash scheme."""
    row = _new_row(spark, userid, itemid, rating)
    row.write.mode("append").parquet(_base_path(warehouse, table))
    meta = FragmentCatalog(warehouse).hash_meta()
    if meta.n <= 0:
        print("There are no hash partitions to insert")
        return
    routed = row.withColumn(
        FRAGMENT_COL, frag.hash_fragment_expr(F.col(meta.key), meta.n)
    )
    routed.write.mode("append").partitionBy(FRAGMENT_COL).parquet(
        _hash_path(warehouse, table)
    )


def hash_key_lookup(
    spark: SparkSession, key_value: int, warehouse: str, table: str = "ratings"
) -> DataFrame:
    """[EXT] Point lookup by routing key: computes the owning fragment
    from the catalog (driver-side arithmetic on the key literal) and
    reads ONLY that fragment — partition pruning by construction, the
    1-of-n scan the reference's pointQuery does for the range scheme
    (Interface1.py:310-347), here for the hash scheme."""
    meta = FragmentCatalog(warehouse).hash_meta()
    if meta.n <= 0:
        raise ValueError("no hash partitions exist")
    import hashlib

    owner = int(hashlib.md5(str(int(key_value)).encode()).hexdigest()[:13], 16) % meta.n
    df = spark.read.parquet(_hash_path(warehouse, table))
    return df.where(
        (F.col(FRAGMENT_COL) == owner) & (F.col(meta.key) == key_value)
    )


def catalog_report(
    spark: SparkSession, warehouse: str, table: str = "ratings"
) -> DataFrame:
    """[EXT] One-stop catalog/layout report: every materialized scheme
    with its catalog parameters and per-fragment row counts — the
    operational view the reference never had. Counts come from pruned
    per-scheme scans (one tiny agg per scheme)."""
    cat = FragmentCatalog(warehouse)
    rows = []
    for scheme, path, n in (
        ("range", _range_path(warehouse, table), cat.range_meta().n),
        ("round_robin", _rr_path(warehouse, table), cat.round_robin_meta().n),
        ("hash", _hash_path(warehouse, table), cat.hash_meta().n),
    ):
        if n <= 0 or not os.path.isdir(path):
            continue
        counts = (
            spark.read.parquet(path)
            .groupBy(FRAGMENT_COL)
            .count()
            .collect()
        )
        for r in counts:
            rows.append((scheme, n, int(r[FRAGMENT_COL]), int(r["count"])))
    return spark.createDataFrame(
        rows, "scheme string, n_fragments int, fragment_id int, n_rows long"
    )


def compact_fragments(
    spark: SparkSession, warehouse: str, table: str, scheme: str,
    target_files_per_fragment: int = 1,
) -> None:
    """[EXT] Small-file compaction: routed single-row inserts accumulate
    one parquet file each (the classic streaming/trickle-insert
    pathology — at scale, file-listing cost alone kills scans). Rewrite
    each fragment directory down to ``target_files_per_fragment`` files
    with a fragment-local repartition; fragment membership, row content
    and partition pruning are unchanged. The commit goes through the
    warehouse FS shim (fs.py): rename-swap on local/HDFS (old layout
    readable until the new one is complete), generation-pointer flip on
    object stores without atomic rename."""
    paths = {
        "range": _range_path(warehouse, table),
        "round_robin": _rr_path(warehouse, table),
        "hash": _hash_path(warehouse, table),
    }
    path = paths[scheme]
    wfs = fslib.fs_for(warehouse, spark)
    df = spark.read.parquet(fslib.resolve_dataset(wfs, path))
    staged = fslib.stage_path(wfs, path, "compact")
    if target_files_per_fragment <= 1:
        # hash-cluster by fragment: each fragment lands whole in one
        # task → exactly one file per fragment directory
        clustered = df.repartition(F.col(FRAGMENT_COL))
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(target_files_per_fragment),
        )
        clustered = df.repartition(F.col(FRAGMENT_COL), salt)
    clustered.write.mode("overwrite").partitionBy(FRAGMENT_COL).parquet(staged)
    fslib.commit_staged(wfs, staged, path, require_marker=True)


def delete_tables(spark: SparkSession, table_or_all: str, warehouse: str) -> None:
    """Drop a named table's datasets, or everything (op #10).

    ``'ALL'`` is case-insensitive like the reference (Interface1.py:375).
    """
    wfs = fslib.fs_for(warehouse, spark)
    if table_or_all.upper() == "ALL":
        wfs.delete(warehouse, recursive=True)
        return
    for p in (
        os.path.join(warehouse, table_or_all),
        _range_path(warehouse, table_or_all),
        _rr_path(warehouse, table_or_all),
        _hash_path(warehouse, table_or_all),
    ):
        wfs.delete(p, recursive=True)
        # also drop old-/staged siblings: a surviving marked stage
        # after a drop is the target-missing-no-old state in which
        # recovery would resurrect stale data for the next reader
        fslib.purge_siblings(wfs, p)
