"""Remaining scan/function coverage: CSV scan with explicit schema, map
functions over parsed JSON (SURVEY.md §2.B scans + map/JSON rows)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@query("scan_csv", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with an explicit schema (no inference pass — one read, typed
    at the source): round-trips nation through a CSV directory."""
    nation = io.load_table(spark, sf_dir, "nation")
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hh_scan_csv_{os.path.basename(sf_dir)}"
    )
    nation.write.mode("overwrite").option("header", "true").csv(out_dir)
    return (
        spark.read.schema(_NATION_SCHEMA)
        .option("header", "true")
        .csv(out_dir)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "map_ops",
    oracle="""
    SELECT event_id,
           json_array_length(json_keys(props)) AS n_keys,
           CAST(json_keys(props)[1] AS VARCHAR) AS first_key,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column family: parse props into MapType, then map_keys /
    size / element_at — the typed alternative to per-path JSON extraction."""
    ev = io.load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        # try_element_at: props='{}' yields an empty map and plain
        # element_at would throw under ANSI; the oracle's [1] is null-safe
        F.try_element_at(F.map_keys(m), F.lit(1)).alias("first_key"),
        F.try_element_at(m, F.lit("k")).alias("k_value"),
    )
