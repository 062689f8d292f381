"""Physical-plan introspection helpers.

The reference hand-implements exactly three optimizations — fragment
pruning, predicate pushdown, batched writes (SURVEY.md §4). In Spark
all three are Catalyst's job; these helpers let tests PROVE they
happened (scan-level PushedFilters / PartitionFilters, broadcast vs
shuffle joins, exchange counts) instead of assuming.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters bracket contents, one string per scan."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_formatted(df))
        if m.group(1).strip()
    ]


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters bracket contents, one string per scan, with
    attribute ids (``#123``) stripped for stable matching."""
    return [
        re.sub(r"#\d+", "", m.group(1).strip())
        for m in re.finditer(r"PartitionFilters: \[(.*?)\]", explain_formatted(df))
        if m.group(1).strip()
    ]


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — column-pruning audit."""
    return re.findall(r"ReadSchema: (\S+)", explain_formatted(df))


def final_explain_formatted(df: DataFrame) -> str:
    """Execute the plan, then return the post-AQE FINAL physical plan.

    Join-strategy assertions belong here, not on the static plan:
    scale-variable joins carry no broadcast hints (a hint that is wrong
    at 1000x the data is a bug), so the static plan shows shuffle joins
    and AQE re-plans them to broadcast at runtime when a side turns out
    small. ``collect()`` drives ``df``'s own QueryExecution, so the
    adaptive plan it mutates is the one this explain reads back
    (``count()``/``write`` would build a different QueryExecution)."""
    df.collect()
    return explain_formatted(df)


def broadcast_join_count(df: DataFrame) -> int:
    return explain_formatted(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return explain_formatted(df).count("SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = explain_formatted(df)
    return len(re.findall(r"\n\(\d+\) Exchange", plan))
