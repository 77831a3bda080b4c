"""Structured Streaming helpers (SURVEY.md §2.B "Streaming").

The fixture is a static parquet file, so streams run with
``trigger(availableNow=True)`` into a memory sink and the helper returns the
materialized result as a batch DataFrame — the same pattern as production
backfill/replay jobs. In production the source line changes to Kafka/files
and the trigger to processingTime; every transformation below is unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Stream-source schema for the events fixture.

    ``readStream`` needs an explicit schema; derive it from the batch
    reader's footer inference so both fixture vintages work (``ts`` as
    nanos-as-long in older fixtures, TIMESTAMP_NTZ micros in newer ones —
    see io.load_events).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture with ``ts`` normalized to
    a microsecond TimestampType (same truncation as io.load_events)."""
    schema = _events_schema(spark, sf_dir)
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def run_stream_to_df(
    stream_df: DataFrame,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink contents as a batch DataFrame.

    ``state_partitions`` sizes the state store (streaming shuffles have no
    AQE, so the session's batch-oriented shuffle.partitions is wrong for
    them): the count is fixed at first planning and should track stateful
    key cardinality / executor cores — 8 suits the local fixtures, a
    cluster job would pass cores-proportional values. Set around the
    synchronous run and restored after.
    """
    spark = stream_df.sparkSession
    name = f"stream_out_{uuid.uuid4().hex[:12]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)
