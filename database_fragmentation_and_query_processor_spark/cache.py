"""Registry for intermediates the operators persist.

Several operators persist a shared intermediate that the RETURNED lazy
plan consumes more than once (the shingle-set table under a MinHash
near-dup join, the brute-force side of the ANN recall audit, the gram
stream of benchmark decontamination). The operator cannot unpersist it
before returning — the caller's action hasn't run yet — so a plain
``.persist()`` would leak cached partitions in a long-lived session
composing many queries (a per-query ``spark.catalog.clearCache()``,
as bench.py does, hides the leak but composition inside ONE session
does not).

Every such persist is routed through :func:`track`; a session that
composes operators calls :func:`release_all` after its consuming
action. At 100 TB this matters more, not less: a leaked corpus-sized
shingle table pins executor storage memory for the life of the app.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for later :func:`release_all`."""
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns how
    many were released. Safe to call repeatedly — already-unpersisted
    frames are a no-op in Spark."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    return n
