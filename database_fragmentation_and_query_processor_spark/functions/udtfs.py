"""Python UDTF (user-defined TABLE function, Spark 4) demonstration.

The engine's position on user functions is JVM-first: every declared
query expresses per-element logic with built-in column expressions or
higher-order functions (see ``q_hof_battery``), because a Python UDTF
pays per-row Python transfer — the slow path. This module exists to
complete the API surface (SURVEY.md §2.2 'UDF/UDAF/UDTF') for the
cases that genuinely need imperative row-to-rows logic that neither
``explode`` over an expression nor ``mapInPandas`` expresses cleanly:
stateful per-row expansion with data-dependent fan-out and early
termination.

``TopTokensUDTF`` yields the top-k most frequent tokens per input row
— deliberately chosen because an equivalent JVM expression exists
(sort_array over a map built with aggregate), which the test uses as
the correctness oracle for the UDTF path.
"""

from __future__ import annotations

from collections import Counter

try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf

    HAVE_UDTF = True
except ImportError:  # pragma: no cover - older runtimes
    HAVE_UDTF = False


if HAVE_UDTF:

    @udtf(returnType="token: string, cnt: int, rank: int")
    class TopTokensUDTF:
        """Per-row expansion: (text, k) → up to k (token, count, rank)
        rows, counts by exact frequency, ties broken lexicographically
        — the same ordering convention as every top-k in the repo."""

        def eval(self, text: str, k: int):  # noqa: D102 - UDTF contract
            if not text or not text.strip():
                return
            counts = Counter(text.split())
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for i, (tok, cnt) in enumerate(ranked[:k], start=1):
                yield tok, cnt, i
