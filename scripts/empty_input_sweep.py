"""Degenerate-input sweep: run EVERY registry query against a
warehouse of empty tables (same schemas as sf0.001) and report which
ones crash instead of returning a frame or raising a descriptive
error.

The ADVICE r11 lows (qlm_dirichlet_search int(None), kcenter_coreset
head()[...] of None) are this class; the sweep finds the remaining
members so they can be hardened in one pass instead of one advisor
round each.

Usage: python scripts/empty_input_sweep.py [start] [end]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def make_empty_dir(spark, src="/root/testdata/sf0.001") -> str:
    out = os.path.join(tempfile.gettempdir(), "dfqp_empty_sf")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet")).limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def main() -> int:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    end = int(sys.argv[2]) if len(sys.argv) > 2 else 10**9

    from pyspark.sql import SparkSession

    import database_fragmentation_and_query_processor_spark.entry_queries as EQ

    spark = (
        SparkSession.builder.appName("dfqp-empty-sweep")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = make_empty_dir(spark)
    names = list(EQ._QUERIES_ALL)[start:end]
    crashes: list[tuple[str, str]] = []
    for i, name in enumerate(names):
        try:
            df = EQ._QUERIES_ALL[name](spark, sf_dir)
            df.limit(5).collect()
            status = "ok"
        except Exception as exc:  # noqa: BLE001 - survey, not control flow
            kind = type(exc).__name__
            # a deliberate, descriptive refusal is fine; a TypeError /
            # IndexError / KeyError subscripting None is the bug class
            status = f"RAISE {kind}: {str(exc).splitlines()[0][:120]}"
            crashes.append((name, status))
        print(f"[{start + i}] {name}: {status}", flush=True)
        from database_fragmentation_and_query_processor_spark import cache

        cache.release_all()
    print(f"\n{len(crashes)} raisers of {len(names)}")
    for n, s in crashes:
        print(" ", n, "|", s)
    return 0


if __name__ == "__main__":
    sys.exit(main())
