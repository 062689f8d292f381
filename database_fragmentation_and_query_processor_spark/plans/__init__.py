"""Plan-quality introspection: assert the physical plan actually has
the shape the 100 TB design calls for."""

from .explain import (
    broadcast_join_count,
    exchange_count,
    explain_formatted,
    final_explain_formatted,
    partition_filters,
    pushed_filters,
    scan_read_schemas,
    sort_merge_join_count,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_formatted",
    "final_explain_formatted",
    "partition_filters",
    "pushed_filters",
    "scan_read_schemas",
    "sort_merge_join_count",
]
