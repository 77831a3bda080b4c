"""Round-5 breadth batch:

- ``json_variant`` — Spark 4 VARIANT ingestion (``parse_json`` +
  ``variant_get``): the binary semi-structured path that replaces
  string-walking ``get_json_object`` at scale (parse once, typed access).
- ``try_fns`` — error-tolerant scalar family (``try_divide``,
  ``try_cast``, ``try_element_at``): malformed rows degrade to NULL
  instead of failing the job — the tolerance contract a 100 TB ingest
  needs (one bad row must not kill a 10k-task stage).
- ``win_rolling_median`` — exact interpolated median over a trailing
  10-row keyed window: the robust smoother for noisy per-user metrics
  (median resists outliers that wreck a rolling mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 7 = 0 AS k_div7
    FROM events
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access: parse the props JSON once
    into Spark 4's binary VARIANT encoding, then typed ``variant_get``
    extraction. vs json_extract (string get_json_object): the parse
    happens once per row, downstream accesses are O(1) binary reads —
    the right shape when many fields are read from one payload."""
    ev = io.load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 7 == 0).alias("k_div7"),
    )


@query(
    "try_fns",
    oracle="""
    SELECT event_id,
           value / nullif(user_id % 5, 0) AS safe_ratio,
           TRY_CAST(event_type AS INT) AS bad_int,
           string_split(event_type, '_')[3] AS third_part
    FROM events
    """,
)
def try_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant scalars: division by zero, an unparseable cast, and
    an out-of-bounds array index all produce NULL rather than a task
    failure. At scale this is the difference between one NULL cell and a
    dead 10k-task stage (ANSI mode's hard-fail is the alternative)."""
    ev = io.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("user_id") % 5).alias("safe_ratio"),
        F.col("event_type").cast("string").try_cast("int").alias("bad_int"),
        F.try_element_at(F.split(F.col("event_type"), "_"), F.lit(3)).alias(
            "third_part"
        ),
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ), 6) AS med10
    FROM events
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-row exact interpolated median per user — the
    outlier-robust rolling smoother. Keyed window partitioning (by
    user_id) keeps state bounded and parallel; both engines use linear
    interpolation, so the result value-hash-verifies after 6dp rounding."""
    ev = io.load_table(spark, sf_dir, "events")
    med = F.expr(
        "percentile(value, 0.5) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
    )
    return ev.select(
        "event_id", "user_id", F.round(med, 6).alias("med10")
    )
