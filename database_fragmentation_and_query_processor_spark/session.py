"""SparkSession factory tuned for this engine.

Library code never creates sessions implicitly — every operator takes
``spark`` as an argument (mirroring how the reference threads
``openconnection`` through every call, Interface1.py:10-11). This module
is for tests / bench / CLI use.

Scale notes: AQE is enabled so that at real cluster scale skewed shuffle
partitions get split and tiny ones coalesced at runtime; shuffle
partition count defaults to the local core count but should be set to
~2-3x total executor cores on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dfqp-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or int(cpus)
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
