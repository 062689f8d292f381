"""Z-order layout: per-file min-max narrowness on every clustered
column (the property parquet data skipping depends on)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.operators.layout import zorder_by


def _avg_file_span(path: str, col: str, domain: float) -> float:
    """Mean (max-min)/domain of ``col`` across the parquet files —
    ~1/n_files for a perfectly clustered column, ~1.0 for random."""
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.read_metadata(f)
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append((max(his) - min(los)) / domain)
    assert spans, f"no stats for {col}"
    return sum(spans) / len(spans)


def test_zorder_narrows_both_dimensions(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    dom_o = li.agg(
        (F.max("l_orderkey") - F.min("l_orderkey")).alias("d")
    ).head()["d"]
    dom_p = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("d")
    ).head()["d"]

    sorted_path = str(tmp_path / "sorted_one_col")
    li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.parquet(sorted_path)
    z_path = str(tmp_path / "zordered")
    zorder_by(li, ["l_orderkey", "l_partkey"], n_partitions=8).write.parquet(z_path)

    # single-column sort: orderkey tight, partkey spans ~everything
    assert _avg_file_span(sorted_path, "l_orderkey", dom_o) < 0.35
    assert _avg_file_span(sorted_path, "l_partkey", dom_p) > 0.8
    # z-order: BOTH dimensions substantially narrowed per file
    zo = _avg_file_span(z_path, "l_orderkey", dom_o)
    zp = _avg_file_span(z_path, "l_partkey", dom_p)
    assert zo < 0.6 and zp < 0.6, (zo, zp)


def test_zorder_preserves_rows(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    z = zorder_by(li, ["l_orderkey", "l_partkey"], n_partitions=4)
    assert z.count() == li.count()
    assert "_zorder" not in z.columns
    a = sorted(map(tuple, li.collect()))
    b = sorted(map(tuple, z.collect()))
    assert a == b
