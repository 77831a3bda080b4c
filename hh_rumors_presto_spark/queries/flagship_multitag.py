"""Multi-tag flagship: the COMPLETE reference dataflow with the per-tag
stage the single-tag flagship folds away (SURVEY.md §2.A rows 13-17):

    per-tag scan -> per-tag first-wins dedup + cap 150 (fetchRumors.js:141-148)
    -> multi-tag UNION (fetchRumors.js:184-185)
    -> global sort desc (187) -> global first-wins dedup (189-196)
    -> offset 1 limit 8 (199) -> final projection (202-209)

``source`` plays the tag role. In Spark the per-tag loop disappears: tags
are just partitions of one keyed window, and the serial union becomes the
table itself — the plan is two keyed window stages + a top-k, all
shuffle-minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.functions import clean, dedup_key, fmt_month_abbrev
from hh_rumors_presto_spark.registry import query

TAG_CAP = 150


@query(
    "flagship_multitag",
    oracle=rf"""
    WITH parsed AS (
        SELECT doc_id AS pos,
               source AS tag,
               trim(regexp_replace(coalesce(substring(text, 1, 25), ''), '\s+', ' ', 'g')) AS title,
               DATE '2024-01-01' + CAST(doc_id % 45 AS INT) AS date,
               'https://' || source || '.example.com/t' AS url
        FROM documents
    ),
    admitted AS (SELECT * FROM parsed WHERE length(title) >= 12),
    per_tag AS (
        SELECT * FROM (
            SELECT *,
                row_number() OVER (
                    PARTITION BY tag, CAST(date AS VARCHAR) || '::' || substring(title, 1, 120) || '::' || url
                    ORDER BY pos
                ) AS dup_rn
            FROM admitted
        ) WHERE dup_rn = 1
    ),
    capped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY tag ORDER BY pos) AS tag_rn
            FROM per_tag
        ) WHERE tag_rn <= {TAG_CAP}
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *,
                row_number() OVER (
                    PARTITION BY CAST(date AS VARCHAR) || '::' || substring(title, 1, 120) || '::' || url
                    ORDER BY date DESC, pos
                ) AS g_rn
            FROM capped
        ) WHERE g_rn = 1
    ),
    windowed AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (ORDER BY date DESC, pos) AS out_rn
            FROM deduped
        ) WHERE out_rn BETWEEN 2 AND 9
    )
    SELECT date,
           list_value('Jan.','Feb.','Mar.','Apr.','May','Jun.','Jul.','Aug.','Sep.','Oct.','Nov.','Dec.')[month(date)]
             || ' ' || CAST(day(date) AS VARCHAR) || ', ' || CAST(year(date) AS VARCHAR) AS date_pretty,
           title, tag AS sourceName, url AS sourceUrl
    FROM windowed
    """,
)
def flagship_multitag(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load_table(spark, sf_dir, "documents")
    parsed = docs.select(
        F.col("doc_id").alias("pos"),
        F.col("source").alias("tag"),
        clean(F.substring("text", 1, 25)).alias("title"),
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 45).cast("int")
        ).alias("date"),
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/t")).alias(
            "url"
        ),
    )
    admitted = parsed.filter(F.length("title") >= 12)

    key = dedup_key(F.col("date"), F.col("title"), F.col("url"))
    # per-tag first-wins dedup in crawl (pos) order, then per-tag cap
    w_tag_dedup = Window.partitionBy(F.col("tag"), key).orderBy("pos")
    per_tag = (
        admitted.withColumn("dup_rn", F.row_number().over(w_tag_dedup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    w_cap = Window.partitionBy("tag").orderBy("pos")
    capped = (
        per_tag.withColumn("tag_rn", F.row_number().over(w_cap))
        .filter(F.col("tag_rn") <= TAG_CAP)
        .drop("tag_rn")
    )
    # global first-wins dedup post-sort-order, then offset/limit
    w_global = Window.partitionBy(key).orderBy(F.col("date").desc(), F.col("pos"))
    deduped = (
        capped.withColumn("g_rn", F.row_number().over(w_global))
        .filter(F.col("g_rn") == 1)
        .drop("g_rn")
    )
    windowed = (
        deduped.orderBy(F.col("date").desc(), F.col("pos")).offset(1).limit(8)
    )
    return windowed.select(
        "date",
        fmt_month_abbrev(F.col("date")).alias("date_pretty"),
        "title",
        F.col("tag").alias("sourceName"),
        F.col("url").alias("sourceUrl"),
    )
