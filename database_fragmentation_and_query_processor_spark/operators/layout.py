"""Physical layout operators for data skipping.

Parquet readers skip row groups / files whose min-max footer stats
exclude a predicate — but stats are only narrow if the writer clustered
the data. Sorting clusters ONE column perfectly and leaves the others
random; Z-ORDERING (Morton-interleaving the bits of several columns)
keeps every participating column's per-file range narrow, so point and
range predicates on ANY of them skip most files. This is the standard
lakehouse technique (OPTIMIZE ... ZORDER BY); here it is a plain
DataFrame transform: deterministic fixed-domain bucket per column (two
tiny min/max aggregates), bit-interleave to a Morton key, range
repartition + in-partition sort on that key.

At 100 TB: the min/max prep is two column-pruned scans; the clustered
write is ONE range shuffle — the same cost as any global sort — paid
once at ingest and amortized over every subsequent pruned read.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MORTON_COL = "_zorder"


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Fixed-domain bucket id in [0, 2^bits) — deterministic (no
    sampling), monotone in the column value."""
    n = 1 << bits
    span = max(hi - lo, 1e-300)
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * n)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("bigint")


def morton_key(buckets: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each bucket column into one Morton
    key — pure JVM bit arithmetic, codegen-friendly."""
    d = len(buckets)
    parts = []
    for i, b in enumerate(buckets):
        for bit in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * d + i
                )
            )
    return reduce(lambda a, c: a + c, parts).cast("bigint")


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Morton interleave of ``cols`` (each
    rank-bucketed into 2^bits fixed-domain buckets from its observed
    min/max). Write the result straight out: every output file then
    covers a narrow range of EVERY participating column, so min-max
    skipping works for predicates on any of them. The Morton column is
    dropped from the result."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).head()
    buckets = [
        _bucket(
            F.col(c),
            float(stats[f"_lo_{c}"]),
            float(stats[f"_hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    keyed = df.withColumn(MORTON_COL, morton_key(buckets, bits))
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, MORTON_COL)
        .sortWithinPartitions(MORTON_COL)
        .drop(MORTON_COL)
    )
