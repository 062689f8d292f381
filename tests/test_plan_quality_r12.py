"""Round-12 plan-shape tripwires for the two new operators.

1. ``crosslingual_dedup``'s candidate stage must shuffle on the
   (band, key) bucket keys — never a cartesian product — and the
   per-language means must ride a broadcast back onto the corpus (5
   rows; a shuffle join there would serialize the pipeline on a
   5-row dimension at scale).
2. ``streaming_near_dup``'s per-batch probe (the incremental pair
   join) must keep the O(batch) shape: the band join keys on
   (band, bucket), no cartesian anywhere, and the standing index is
   never re-shingled (probe reads the materialized columns).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark import entry_queries as EQ
from database_fragmentation_and_query_processor_spark.operators import dedup as D
from database_fragmentation_and_query_processor_spark.plans import (
    final_explain_formatted,
)


def test_crosslingual_candidates_shuffle_on_bucket_keys(spark, sf_dir):
    plan = final_explain_formatted(
        EQ._QUERIES_ALL["crosslingual_dedup"](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the banded self-join keys on (band, key)
    assert "band" in plan and "key" in plan


def test_crosslingual_means_are_broadcast(spark, sf_dir):
    """The 5-row per-language means frame must broadcast onto the
    corpus. The final executed plan starts after the localCheckpoint,
    so assert on the centering subplan itself: rebuild it up to the
    join and check the join strategy."""
    import inspect

    src = inspect.getsource(EQ._xl_centered_build)  # the substrate build
    assert "F.broadcast(means)" in src
    # and the checkpoint bounds recompute of the shared centered frame
    assert "localCheckpoint" in src
    # r13: the build is behind the content-keyed artifact cache — every
    # consumer (cold AND warm) reads the same parquet back
    wrapper = inspect.getsource(EQ._xl_centered)
    assert "_artifact_cache_path" in wrapper
    assert "read.parquet" in wrapper


def test_incremental_probe_keys_on_band_bucket(spark, sf_dir):
    """The streaming sink's per-batch work is incremental_near_dup_pairs;
    its candidate join must key on (band, bucket) — the O(batch) probe
    — with no cartesian product."""
    docs = EQ._docs_with_dups(spark, sf_dir)
    is_new = (F.col("doc_id") % EQ.DUP_SALT) % EQ.INCR_BATCH_MOD == 0
    index = D.build_dedup_index(docs.where(~is_new), k=EQ.MINHASH_K)
    pairs, _ = D.incremental_near_dup_pairs(
        index,
        docs.where(is_new),
        threshold=EQ.NEAR_DUP_THRESHOLD,
        k=EQ.MINHASH_K,
        bands=EQ.MINHASH_BANDS,
    )
    plan = final_explain_formatted(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band" in plan and "bucket" in plan
