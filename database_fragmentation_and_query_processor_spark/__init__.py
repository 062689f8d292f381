"""PySpark-native analytics engine with the capabilities of the reference
``Database-Fragmentation-and-Query-Processor`` (horizontal fragmentation +
pruned query processing), rebuilt Spark-first and extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Layout
------
- :mod:`.schema`      — shared StructTypes (ratings relation, metadata)
- :mod:`.catalog`     — JSON metadata sidecar (fragment catalogs, RR cursor)
- :mod:`.api`         — reference-shaped facade (loadRatings/rangePartition/...)
- :mod:`.operators`   — fragmentation, pruned queries, dedup, similarity, text
- :mod:`.sources`     — readers (``::``-delimited ratings text, testdata tables)
- :mod:`.functions`   — column-expression libraries (text stats, vector math)
- :mod:`.streaming`   — Structured Streaming over the events table
- :mod:`.multimodal`  — binary-column plumbing (decode stubs, real Spark shape)

Everything is DataFrame-first: partition pruning, predicate pushdown, and
column pruning are delegated to Catalyst by construction.
"""

__version__ = "0.1.0"
