"""transformWithState (Spark 4 arbitrary-state API): the per-user
running-totals processor. Execution needs google.protobuf (the TWS
Python runner's wire format) — absent here, so the end-to-end drain is
gated like the PIL codec path: processor logic and plan construction
are asserted everywhere, full parity runs where protobuf exists."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from database_fragmentation_and_query_processor_spark.streaming import (
    events as SE,
)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_processor_logic_accumulates_exact_integers():
    """The processor itself is plain Python — drive it with a fake
    state handle: counts and micro-unit sums accumulate exactly and
    order-free across batches."""

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeState()

    p = SE.RunningTotalsProcessor()
    p.init(FakeHandle())
    b1 = pd.DataFrame({"value": [1.25, 2.5]})
    b2 = pd.DataFrame({"value": [0.03]})
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert out1.loc[0, "n_events"] == 2
    assert out1.loc[0, "total_micros"] == 1_250_000 + 2_500_000
    assert out2.loc[0, "n_events"] == 3
    want = int(np.floor(0.03 * 1e6)) + 3_750_000
    assert out2.loc[0, "total_micros"] == want


def test_tws_plan_constructs(spark, sf_dir):
    """API wiring: the streaming plan must ANALYZE (schema, grouping,
    output struct) regardless of the runtime protobuf dependency."""
    stream = SE.read_events_stream(spark, sf_dir)
    res = SE.user_running_totals_tws(stream)
    assert res.isStreaming
    assert [f.name for f in res.schema.fields] == [
        "user_id",
        "n_events",
        "total_micros",
    ]


def test_tws_end_to_end_or_documented_gate(spark, sf_dir):
    """Where protobuf exists: drain and compare against the exact batch
    aggregate. Where it doesn't: the failure must be exactly the
    documented missing-dependency mode, not some other breakage."""
    import duckdb
    from pyspark.sql.streaming import StreamingQueryException

    stream = SE.read_events_stream(spark, sf_dir)
    res = SE.user_running_totals_tws(stream)
    if not _has_protobuf():
        with pytest.raises(StreamingQueryException):
            SE.run_with_rocksdb_state(res, spark, state_partitions=4)
        return
    out = SE.run_with_rocksdb_state(res, spark, state_partitions=4)
    got = (
        out.toPandas()
        .groupby("user_id")
        .agg(n_events=("n_events", "max"), total_micros=("total_micros", "max"))
        .reset_index()
    )
    con = duckdb.connect()
    ref = con.sql(
        f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value*1000000) AS BIGINT)) AS BIGINT) AS m
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY user_id
        """
    ).df()
    merged = got.merge(ref, on="user_id", how="outer")
    assert len(merged) == len(ref) == len(got)
    assert (merged["n_events"] == merged["n"]).all()
    assert (merged["total_micros"] == merged["m"]).all()
