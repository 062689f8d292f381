"""Operator library: fragmentation, pruned queries, dedup, similarity,
text analysis, top-k."""
