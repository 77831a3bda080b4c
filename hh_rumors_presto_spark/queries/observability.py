"""Observability: the reference's debug counters (ref #22,
fetchRumors.js:90,122,136,181,212 — totalMerged / totalAfterDedup /
returning) re-expressed as stage-cardinality queries, plus an
``observe()``-instrumented variant whose metrics flow through Spark's
listener bus (the production path — zero extra jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark.registry import query


def _stages(spark: SparkSession, sf_dir: str):
    """The flagship pipeline's three counted stages (shared builder in
    queries/flagship.py — one source of truth)."""
    from hh_rumors_presto_spark.queries.flagship import flagship_stages

    s = flagship_stages(spark, sf_dir)
    return s["admitted"], s["deduped"], s["windowed"]


@query(
    "debug_counters",
    oracle=r"""
    WITH parsed AS (
        SELECT doc_id AS pos,
               trim(regexp_replace(coalesce(substring(text, 1, 30), ''), '\s+', ' ', 'g')) AS title,
               DATE '2024-01-01' + CAST(doc_id % 60 AS INT) AS date,
               'https://' || source || '.example.com/item' AS url
        FROM documents
    ),
    merged AS (SELECT * FROM parsed WHERE length(title) >= 15),
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY CAST(date AS VARCHAR) || '::' || substring(title, 1, 120) || '::' || url
                ORDER BY date DESC, pos) AS rn
            FROM merged)
        WHERE rn = 1
    )
    SELECT 'totalMerged' AS stage, count(*) AS n FROM merged
    UNION ALL
    SELECT 'totalAfterDedup', count(*) FROM deduped
    UNION ALL
    SELECT 'returning', greatest(least(count(*) - 1, 8), 0) FROM deduped
    """,
)
def debug_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline cardinality counters as a tiny result table — the
    reference's debug=1 introspection (its only EXPLAIN ANALYZE)."""
    merged, deduped, returning = _stages(spark, sf_dir)
    rows = [
        merged.agg(
            F.lit("totalMerged").alias("stage"), F.count("*").alias("n")
        ),
        deduped.agg(
            F.lit("totalAfterDedup").alias("stage"), F.count("*").alias("n")
        ),
        returning.agg(
            F.lit("returning").alias("stage"), F.count("*").alias("n")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def observed_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-path variant: ``df.observe`` attaches named count
    metrics to the plan itself; they are published on the listener bus after
    the action with no extra jobs. Exercised in tests/test_operators.py."""
    merged, deduped, returning = _stages(spark, sf_dir)
    return returning.observe("returning_stage", F.count(F.lit(1)).alias("n"))
