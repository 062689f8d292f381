"""The query registry, split from entry_queries.py along its family
seams (r13 verdict task 6). ``registry`` holds the assembled QUERIES /
ORACLE_SQL; the sibling modules hold the family definitions in the
original statement order (see _fold)."""

from . import registry  # noqa: F401 — assembles the full namespace
