"""SparkSession construction for tests and benchmarks.

The driver supplies its own session to ``__spark_entry__`` functions, so
engine code must never *require* this builder — queries set any
runtime-settable conf they need themselves (see ``tables.load_events``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "chess-ratings-spark") -> SparkSession:
    """Local-mode session tuned for the test/bench environment.

    local[N] = one JVM, N executor threads; shuffle partitions sized to
    cores (the 200 default over-parallelizes small scale factors and the
    AQE coalescer handles the rest). On a real cluster these settings are
    cluster-conf concerns, not engine code.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
