"""Contracts of the r14 entry_queries.py → queries/ package split
(r13 verdict task 6): module size bound, identical registry surface,
facade compatibility, and the one-patch-point delegate mechanism the
fold relies on."""

from __future__ import annotations

import glob
import importlib
import os

from database_fragmentation_and_query_processor_spark import entry_queries as EQ
from database_fragmentation_and_query_processor_spark.queries import _fold
from database_fragmentation_and_query_processor_spark.queries import registry

PKG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "database_fragmentation_and_query_processor_spark",
    "queries",
)


def test_no_module_exceeds_six_thousand_lines():
    """The split's done-bar: the 25.6k-line single module is gone and
    nothing regrew past 6k lines."""
    sizes = {
        os.path.basename(p): sum(1 for _ in open(p))
        for p in glob.glob(os.path.join(PKG_DIR, "*.py"))
    }
    over = {n: s for n, s in sizes.items() if s > 6000}
    assert not over, over
    assert len(sizes) >= 12, sizes  # common + 9 families + registry + _fold


def test_registry_surface_identical_through_facade():
    """entry_queries re-exports registry's namespace: the dicts are the
    same objects, every query name has an oracle, and the r14 window
    convention holds (50-name unique head)."""
    assert EQ.QUERIES is registry.QUERIES
    assert EQ.ORACLE_SQL is registry.ORACLE_SQL
    assert set(EQ.QUERIES) == set(EQ.ORACLE_SQL)
    assert len(EQ.QUERIES) == 336
    head = list(EQ.QUERIES)[:50]
    assert head == registry._R14_WINDOW
    assert len(set(head)) == 50


def test_fold_order_matches_modules_on_disk():
    """_fold.ORDER lists exactly the non-registry family modules, each
    importable, and registry folds all of them (its namespace holds
    every module's public query builders)."""
    files = {
        os.path.basename(p)[:-3]
        for p in glob.glob(os.path.join(PKG_DIR, "*.py"))
    } - {"__init__", "_fold", "registry"}
    assert set(_fold.ORDER) == files
    for m in _fold.ORDER:
        mod = importlib.import_module(
            f"database_fragmentation_and_query_processor_spark.queries.{m}"
        )
        for k, v in vars(mod).items():
            if k.startswith("q_") and callable(v):
                assert getattr(registry, k) is v or k in vars(registry), k


def test_every_query_fn_resolves_shared_helpers(spark):
    """The delegate mechanism: patching common._t_impl must reach a
    query defined in ANY family module, because every folded copy of
    _t is one function object whose globals are common's."""
    from pyspark.sql import functions as F

    from database_fragmentation_and_query_processor_spark.queries import common as CQ
    from database_fragmentation_and_query_processor_spark.queries import families

    marker = {"calls": 0}
    real = CQ._t_impl

    def spy(spark_, sf_dir, name):
        marker["calls"] += 1
        return real(spark_, sf_dir, name)

    CQ._t_impl = spy
    try:
        # a query defined three modules away from common
        families.q1_pricing_summary(spark, "/root/testdata/sf0.001").limit(
            1
        ).collect()
    finally:
        CQ._t_impl = real
    assert marker["calls"] >= 1
    # and the family module's _t binding IS common's delegate object
    assert families._t is CQ._t
    assert families.F is F


def test_no_duplicate_query_names_across_modules():
    """Every registry name maps to exactly one builder; the assembled
    dict did not silently drop or shadow an entry during the split."""
    names = list(EQ.QUERIES)
    assert len(names) == len(set(names))
    for n, fn in EQ.QUERIES.items():
        assert callable(fn), n
