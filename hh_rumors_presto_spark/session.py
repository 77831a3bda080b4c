"""SparkSession factory.

Local-mode settings mirror the driver harness (local[$SPARK_GRAFT_CPUS],
AQE on, UTC session timezone for DuckDB-oracle parity). At cluster scale the
same builder works — only master/shuffle-partition sizing change, and AQE
re-plans partition counts at runtime anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "hh_rumors_presto_spark") -> SparkSession:
    """Build (or fetch) the session.

    Notes on the knobs:
    - AQE + coalescePartitions: runtime re-plan of shuffle partition counts;
      at 100 TB this is what turns the static ``shuffle.partitions`` hint
      into right-sized partitions, and skewJoin splits hot keys.
    - UTC timezone: Spark timestamps are session-TZ, DuckDB's are UTC-naive;
      pinning UTC makes oracle comparisons exact.
    - Arrow: vectorized pandas-UDF / toPandas transfer.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
