"""SQL-surface batch: LATERAL correlated subqueries and gaps-and-islands
run compression — classic SQL shapes a reference user expects verbatim.

Scale notes (100 TB posture):
- ``sql_lateral_topk``: Catalyst decorrelates the per-row LATERAL
  ORDER BY/LIMIT subquery into a keyed window top-k + equi-join (the plan
  is gated on Window + no nested loop) — per-row re-execution never
  happens, which is what makes LATERAL usable over a fact table.
- ``win_gaps_islands``: the id - row_number() trick compresses
  consecutive-id runs with one keyed window + one aggregation — the
  standard O(n) shape for inventory/sequence hole detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.operators.windows import bucketed_rank_cumsum
from hh_rumors_presto_spark.registry import query


@query(
    "sql_lateral_topk",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber,
           CAST(l.l_quantity AS DOUBLE) AS l_quantity
    FROM (SELECT o_orderkey FROM orders WHERE o_orderkey % 50 = 0) o,
    LATERAL (
        SELECT l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey = o.o_orderkey
        ORDER BY l_quantity DESC, l_linenumber LIMIT 2
    ) l
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 lineitems per order): the SQL
    text a warehouse user writes, decorrelated by Catalyst into a keyed
    window + equi-join — no per-row subquery execution, no nested loop."""
    io.load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sql_surface_lineitem"
    )
    io.load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "sql_surface_orders"
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber,
               CAST(l.l_quantity AS DOUBLE) AS l_quantity
        FROM (SELECT o_orderkey FROM sql_surface_orders
              WHERE o_orderkey % 50 = 0) o,
        LATERAL (
            SELECT l_linenumber, l_quantity FROM sql_surface_lineitem
            WHERE l_orderkey = o.o_orderkey
            ORDER BY l_quantity DESC, l_linenumber LIMIT 2
        ) l
        """
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH present AS (
        SELECT doc_id FROM documents WHERE n_chars % 7 <> 0
    ),
    grp AS (
        SELECT doc_id,
               doc_id - row_number() OVER (ORDER BY doc_id) AS island
        FROM present
    )
    SELECT min(doc_id) AS start_id,
           max(doc_id) AS end_id,
           CAST(count(*) AS BIGINT) AS run_len
    FROM grp
    GROUP BY island
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: compress consecutive doc_id runs (holes punched
    by a deterministic predicate) into (start, end, length) intervals via
    the id - row_number() constant-per-run key. The global row_number
    comes from the bucketed two-pass cumsum
    (operators/windows.py:bucketed_rank_cumsum, rank-only mode —
    converted round 10), so no data-scaled single-partition window
    exists even on the whole-table fixture key; at 100 TB the same
    shape also runs per tenant key (e.g., per shard/day)."""
    present = (
        io.load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") % 7 != 0)
        .select("doc_id")
    )
    grp = bucketed_rank_cumsum(
        present, order_key="doc_id", tiebreak="doc_id"
    ).select(
        "doc_id", (F.col("doc_id") - F.col("rk")).alias("island")
    )
    return (
        grp.groupBy("island")
        .agg(
            F.min("doc_id").alias("start_id"),
            F.max("doc_id").alias("end_id"),
            F.count("*").cast("bigint").alias("run_len"),
        )
        .drop("island")
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (spark.sql(..., args={...})): the injection-safe
    binding API every SQL-facing service should use instead of string
    interpolation — values arrive as TYPED literals through the parser,
    never as concatenated text. The oracle pins that a bound :threshold /
    :status produce exactly the literal-query plan and results."""
    io.load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(min(o_orderkey) AS BIGINT) AS first_key
        FROM orders_param
        WHERE o_totalprice > :threshold AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"threshold": 150000.0, "status": "O"},
    )
