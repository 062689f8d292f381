"""Merge / upsert (SCD-1 "last write wins") as a batch operator.

Spark has no MERGE INTO on plain parquet, and the reference engine has
no update path at all (its only mutation is the routed INSERT,
Interface1.py:183-259). The scalable batch idiom is union + one
row_number window per key:

    base ∪ updates  →  row_number() over (partition by key
                                          order by version desc)  → rk=1

- ONE shuffle (on the merge key) regardless of update count;
- no driver-side diffing, no per-row lookups;
- at 100 TB the shuffle partitions by key exactly like the downstream
  consumers, so the merge can share a bucketed layout (see
  operators/bucketing.py) and skip even that exchange.

A full-outer-join merge would also work but shuffles BOTH sides and
builds a wider row; the window form wins once updates are a small
fraction of base — the common CDC-compaction case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SRC = "__merge_src"
_RK = "__merge_rk"


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Apply ``updates`` over ``base`` by key: a key present in both
    keeps only the updates row; a key only in updates is inserted.
    Schemas must match (unionByName). ``tiebreak_cols`` deterministically
    orders duplicate keys WITHIN one side (highest wins)."""
    tagged = base.withColumn(_SRC, F.lit(0)).unionByName(
        updates.withColumn(_SRC, F.lit(1))
    )
    order: list[Column] = [F.desc(_SRC)]
    for c in tiebreak_cols or []:
        order.append(F.desc(c))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn(_RK, F.row_number().over(w))
        .where(F.col(_RK) == 1)
        .drop(_SRC, _RK)
    )


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    version_col: str | None = None,
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete) over a base table —
    the missing piece between ``merge_upsert`` (no deletes) and a real
    transactional MERGE. ``changes`` carries ``op_col`` ∈ {'I','U','D'}
    plus the full row payload; per key, the LATEST change (by
    ``version_col``, highest wins) decides: D → key removed, I/U → row
    replaced/inserted. Same single-shuffle shape as ``merge_upsert``:
    union + one per-key window, then a filter drops tombstones — no
    join, no driver-side diffing, and the shuffle keys match downstream
    consumers so a bucketed layout removes even that exchange.

    Determinism: with ``version_col``, ties on (key, version) — and,
    without it, multiple changes to one key in a single batch — would
    leave the survivor to partition luck. Two last-resort tie-breaks
    (op code, then a hash over the full payload) pin ONE stable winner,
    so repeated runs over the same input always agree. The choice among
    genuinely conflicting same-version changes is still arbitrary —
    feeds that carry several changes per key per batch should supply
    ``version_col`` to make it meaningful, not merely stable.
    """
    tagged = base.withColumn(_SRC, F.lit(0)).withColumn(
        op_col, F.lit("I")
    ).unionByName(changes.withColumn(_SRC, F.lit(1)))
    order: list[Column] = [F.desc(_SRC)]
    if version_col:
        order.append(F.desc(version_col))
    # stable last-resort tie-breaks: never let row_number() fall through
    # to partition order
    order.append(F.desc(op_col))
    order.append(
        F.desc(F.hash(*[c for c in tagged.columns if c != _SRC]))
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        tagged.withColumn(_RK, F.row_number().over(w))
        .where((F.col(_RK) == 1) & (F.col(op_col) != "D"))
        .drop(_SRC, _RK, op_col)
    )


def scd2_history(
    versions: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Build SCD-2 validity intervals from a versioned changelog: each
    key's versions become rows with ``valid_from`` = own version and
    ``valid_to`` = next version (NULL for the current row, which also
    gets ``is_current = true``).

    One window per key (single shuffle on the merge key, like
    ``merge_upsert``); no self-join — ``lead`` supplies the closing
    version. The changelog itself can be arbitrarily large: state per
    key is bounded by its version count, never materialized driver-side.
    """
    w = Window.partitionBy(*key_cols).orderBy(version_col)
    nxt = F.lead(version_col).over(w)
    return versions.withColumn("valid_to", nxt).withColumn(
        "is_current", nxt.isNull()
    ).withColumnRenamed(version_col, "valid_from")
