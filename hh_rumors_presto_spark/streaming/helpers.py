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

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see io.load_events)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture with ``ts`` normalized to
    a microsecond TimestampType (same truncation as io.load_events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(sf_dir)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
