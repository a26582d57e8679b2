"""SparkSession builder tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same config block is
what we would ship to a 1000-executor cluster — AQE (runtime re-plan +
skew-join splitting), auto broadcast for dim tables, Arrow for the few
pandas-UDF operators, and shuffle partitions sized via env so the same
code scales from sf0.001 (32 partitions) to 100 TB (tens of thousands).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "b2b-pipeline-spark", master: str | None = None) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    Every knob here is scale-motivated, not test-motivated:

    - AQE coalesces post-shuffle partitions and splits skewed ones at
      runtime, so a fixed ``shuffle.partitions`` misconfiguration does
      not sink a 100 TB run.
    - ``autoBroadcastJoinThreshold`` keeps dimension joins (region,
      nation, supplier, part) shuffle-free.
    - Arrow makes the pandas-UDF operators (MinHash, SimHash,
      multimodal) batch-transfer instead of row-pickle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128MB")
        .config("spark.sql.session.timeZone", "UTC")
        # 16g: local mode runs all 32 task slots in the ONE driver JVM
        # and task retries are off (maxFailures=1), so a transient
        # GCLocker allocation failure in a heavy stage is fatal — at
        # 8g the sf10 wedge-closure stage died this way (round 13).
        # On a real cluster this is per-executor memory, not driver.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
