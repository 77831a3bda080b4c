"""Engine-surface keys: explicit caching with plan reuse, SQL-registered
functions over temp views, and AQE rebalance hints — the session-level
APIs a reference user drives besides plain DataFrame chains.

Scale notes (100 TB posture):
- ``cache_reuse`` materializes a shared intermediate ONCE
  (MEMORY_AND_DISK, partition-local — no shuffle added) and feeds two
  downstream aggregates from the in-memory columnar scan; without the
  persist, both branches re-scan and re-filter the fact table. This is
  the canonical fan-out pattern for multi-report jobs.
- ``sql_function_registry`` shows the SQL extension path: an
  Arrow-batched pandas UDF registered under a SQL name, callable from
  ``spark.sql`` text over a temp view — how a platform team ships custom
  scalar functions to SQL-only users. The UDF itself stays vectorized.
- ``hint_rebalance`` is the AQE output-rebalance hint: it inserts a
  runtime-sized exchange so a skewed final stage writes even files —
  the knob for sink file-size hygiene at scale (vs a blind repartition(N)
  whose N is wrong at any other data size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "cache_reuse",
    oracle="""
    WITH base AS (
        SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity < 30
    )
    SELECT 'sum_qty' AS metric, l_returnflag AS key,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS val
    FROM base GROUP BY l_returnflag
    UNION ALL
    SELECT 'avg_price' AS metric, l_linestatus AS key,
           CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) / count(*), 4) AS DOUBLE) AS val
    FROM base GROUP BY l_linestatus
    """,
)
def cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-intermediate caching: one filtered projection of lineitem is
    persisted and re-read by two independent aggregates (the plan's second
    branch shows InMemoryTableScan instead of a second parquet scan +
    filter). Exact DECIMAL sums keep both branches order-insensitive."""
    base = (
        io.load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 30)
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sum_qty = base.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s")
    ).select(
        F.lit("sum_qty").alias("metric"),
        F.col("l_returnflag").alias("key"),
        F.col("s").cast("double").alias("val"),
    )
    avg_price = base.groupBy("l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("n"),
    ).select(
        F.lit("avg_price").alias("metric"),
        F.col("l_linestatus").alias("key"),
        F.round(F.col("s").cast("double") / F.col("n"), 4)
        .cast("double")
        .alias("val"),
    )
    return sum_qty.unionAll(avg_price)


@query(
    "sql_function_registry",
    oracle="""
    SELECT p_partkey,
           trim(regexp_replace(regexp_replace(
               lower(strip_accents(p_name || ' & Co')),
               '&', ' and ', 'g'), '[^a-z0-9]+', '_', 'g'), '_') AS slug
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def sql_function_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL extension surface: the slugify pandas UDF (NFD fold, ref
    fetchRumors.js:33-38) registered as a SQL-callable function and used
    from ``spark.sql`` text over a temp view — the path that exposes
    engine-side custom functions to SQL-only users. Registration is
    per-session and idempotent; the UDF remains Arrow-batched."""
    import re
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    # no type hints: postponed-annotation strings defeat pandas_udf's
    # signature inference; the explicit returnType carries the contract
    def _slug_series(s):
        def one(v):
            if v is None:
                return ""
            folded = "".join(
                ch
                for ch in unicodedata.normalize("NFD", v)
                if not (0x0300 <= ord(ch) <= 0x036F)
            )
            x = folded.lower().replace("&", " and ")
            return re.sub("[^a-z0-9]+", "_", x).strip("_")

        return s.map(one)

    part = io.load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    spark.udf.register("slug_ascii", pandas_udf(_slug_series, "string"))
    part.createOrReplaceTempView("engine_surface_part")
    return spark.sql(
        """
        SELECT p_partkey, slug_ascii(p_name || ' & Co') AS slug
        FROM engine_surface_part
        """
    )


@query(
    "hint_rebalance",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def hint_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE rebalance hint ahead of the final stage: lets the runtime size
    the output exchange from observed bytes (splitting skewed partitions,
    coalescing tiny ones) — the sink-hygiene knob that a hardcoded
    ``repartition(N)`` can't provide across data scales. Result values are
    hint-independent; the plan carries RebalancePartitions."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        .hint("rebalance")
    )
