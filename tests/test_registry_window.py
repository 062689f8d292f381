"""Driver-contract registry tripwires.

The driver stamps correctness rows for the FIRST 50 entries of
``queries()`` only, so dict order is load-bearing. These tests pin the
round-4 window so a refactor can't silently reshuffle it, and pin the
1:1 queries↔oracles invariant (every declared operator must be
hash-checkable — 183/183 as of round 4).
"""

from __future__ import annotations

from database_fragmentation_and_query_processor_spark import entry_queries as EQ

FRAG_PINNED = [
    "frag_range_counts",
    "frag_rr_counts",
    "frag_range_query",
    "frag_point_query",
    "frag_reconstruction",
]

#: the 45 fills of the round-4 window: 33 never stamped in r1-r3, 7
#: stale r2 fixture-drift rows, 5 new round-4 operators.
ROUND4_WINDOW = {
    # never stamped (positions 6-38)
    "frag_skew_report", "multimodal_resize", "multimodal_frames",
    "data_profile", "heavy_hitters_salted", "user_zscore_outliers",
    "quality_gate_funnel", "bloom_pruned_revenue", "join_null_semantics",
    "trimmed_mean_per_segment", "bool_agg_battery", "string_agg_battery",
    "regex_battery", "datetime_battery", "conditional_null_battery",
    "embedding_quantization", "mixture_weights", "stopword_discovery",
    "near_dup_audit", "ann_recall_audit", "frame_semantics_battery",
    "sequence_packing", "doc_sample_weighted", "benchmark_decontamination",
    "incremental_near_dup", "orders_cdc_apply", "events_variant_kpis",
    "user_growth", "retention_cohorts", "curation_pipeline",
    "events_time_pruned", "lineitem_zorder_skip", "approx_distinct_users",
    # stale r2 rows to re-stamp (positions 39-45)
    "events_hourly", "sessionization", "asof_click_attribution",
    "streaming_hourly", "events_sliding_windows", "session_windows",
    "events_pivot",
    # new round-4 operators (positions 46-50)
    "paragraph_dedup", "doc_char_entropy", "pmi_collocations",
    "pii_redaction", "bucketed_join_revenue",
}


def test_stamp_window_composition():
    names = list(EQ.QUERIES)
    assert names[:5] == FRAG_PINNED
    assert set(names[5:50]) == ROUND4_WINDOW
    assert len(names) == len(set(names))


def test_every_query_has_an_oracle():
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL), (
        set(EQ.QUERIES) ^ set(EQ.ORACLE_SQL)
    )


def test_oracles_are_plain_select_strings():
    for name, sql in EQ.ORACLE_SQL.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
