"""Lakehouse-pattern operators without a table format: SCD2 merge emulated
with anti-join + union + window (the v1-image answer to MERGE INTO — Delta/
Iceberg jars are not available, so the pattern is expressed in plain
DataFrame ops), and wide->long unpivot."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "scd2_merge",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, new_bal, update_date
        FROM (
            SELECT o_custkey AS c_custkey, o_totalprice AS new_bal,
                   max(CAST(o_orderdate AS DATE))
                       OVER (PARTITION BY o_custkey) AS update_date,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        WHERE rn = 1
    ),
    closed AS (
        SELECT c.c_custkey, c.c_acctbal AS bal,
               DATE '1990-01-01' AS valid_from,
               u.update_date AS valid_to
        FROM customer c JOIN updates u ON c.c_custkey = u.c_custkey
    ),
    opened AS (
        SELECT c_custkey, new_bal AS bal, update_date AS valid_from,
               CAST(NULL AS DATE) AS valid_to
        FROM updates
    ),
    untouched AS (
        SELECT c.c_custkey, c.c_acctbal AS bal,
               DATE '1990-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    )
    SELECT * FROM closed
    UNION ALL SELECT * FROM opened
    UNION ALL SELECT * FROM untouched
    """,
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge: apply per-customer updates (latest order total as
    the new balance) to the customer dimension — close the old version at
    the update date, open a new current version, pass untouched rows
    through. MERGE INTO semantics from anti-join + union; each branch is a
    single keyed join so the whole merge is two shuffles of the dimension.
    """
    cust = io.load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").alias("bal")
    )
    orders = io.load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    updates = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max_by("o_totalprice", F.struct(od, F.col("o_orderkey"))).alias(
            "new_bal"
        ),
        F.max(od).alias("update_date"),
    )
    epoch = F.lit("1990-01-01").cast("date")
    null_date = F.lit(None).cast("date")
    closed = cust.join(updates, "c_custkey").select(
        "c_custkey",
        "bal",
        epoch.alias("valid_from"),
        F.col("update_date").alias("valid_to"),
    )
    opened = updates.select(
        "c_custkey",
        F.col("new_bal").alias("bal"),
        F.col("update_date").alias("valid_from"),
        null_date.alias("valid_to"),
    )
    untouched = cust.join(updates, "c_custkey", "left_anti").select(
        "c_custkey",
        "bal",
        epoch.alias("valid_from"),
        null_date.alias("valid_to"),
    )
    return closed.unionAll(opened).unionAll(untouched)


@query(
    "unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS value
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via native melt/unpivot — the inverse of
    agg_pivot; no shuffle at all, pure row expansion."""
    li = io.load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 50 == 0
    )
    return li.melt(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn(
        "metric",
        F.when(F.col("metric") == "l_quantity", "quantity")
        .when(F.col("metric") == "l_extendedprice", "price")
        .otherwise("discount"),
    )
