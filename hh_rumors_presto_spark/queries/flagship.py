"""Flagship query: the reference's full pipeline re-expressed over the
``documents`` fixture (SURVEY.md §7.1 M0, §7.3).

Exercises, in one plan: scan -> clean (whitespace normalize, SURVEY §2.A.3)
-> admission filter (§2.A.9) -> derived date/url columns -> global sort desc
with explicit tiebreaker (§2.A.15) -> first-wins dedup on the composite
``date::title120::url`` key (§2.A.16, fetchRumors.js:189-196) -> offset 1
limit 8 (§2.A.17, fetchRumors.js:199) -> final projection with
``date_pretty`` and ``suppressSource`` (§2.A.18-20).

Rows are unordered in Spark, so document order is materialized as ``pos``
(= doc_id) and every order-sensitive step uses the total order
(date DESC, pos ASC) — SURVEY §7.4 item 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.functions import (
    body_already_has_source,
    clean,
    dedup_key,
    fmt_month_abbrev,
)
from hh_rumors_presto_spark.registry import query


def flagship_stages(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The pipeline's named intermediate stages — the single source of
    truth reused by flagship_pipeline, render_block (queries/render.py) and
    debug_counters (queries/observability.py); their SQL oracles mirror
    these exact derivations."""
    docs = io.load_table(spark, sf_dir, "documents")

    # Parse/extract stage analog: title from the text block, document order
    # as pos, a forward-filled-style derived date, source link columns.
    parsed = docs.select(
        F.col("doc_id").alias("pos"),
        clean(F.substring(F.col("text"), 1, 30)).alias("title"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (F.col("doc_id") % 60).cast("int"),
        ).alias("date"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/item")
        ).alias("url"),
        F.col("source").alias("sourceName"),
        F.col("doc_id"),
    )

    # Admission filter (tag/p-li has no analog here; length >= 15 does).
    admitted = parsed.filter(F.length("title") >= 15)

    # Snippet (inner HTML, like paragraphHTML output) with a trailing
    # anchor; href/text vary so suppressSource does.
    snip = admitted.withColumn(
        "snippet_html",
        F.concat(
            F.col("title"),
            F.lit(' <a href="'),
            F.when(F.col("doc_id") % 3 == 0, F.col("url")).otherwise(
                F.concat(F.col("url"), F.lit("/x"))
            ),
            F.lit('">'),
            F.when(F.col("doc_id") % 2 == 0, F.col("sourceName")).otherwise(
                F.lit("Other")
            ),
            F.lit("</a>"),
        ),
    )

    # Global first-wins dedup AFTER the sort order is defined: survivor of
    # each composite-key group is the (date DESC, pos ASC)-first row.
    key = dedup_key(F.col("date"), F.col("title"), F.col("url"))
    w_dedup = Window.partitionBy(key).orderBy(F.col("date").desc(), F.col("pos"))
    deduped = (
        snip.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # Offset 1, limit 8 over the deterministic total order. Native
    # offset/limit (not an unpartitioned row_number window, which would
    # move the whole table to one partition): Spark plans sort+limit as a
    # parallel partial top-k per partition + tiny final merge.
    windowed = (
        deduped.orderBy(F.col("date").desc(), F.col("pos")).offset(1).limit(8)
    )
    return {
        "admitted": admitted,
        "deduped": deduped,
        "windowed": windowed,
    }


def _pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    windowed = flagship_stages(spark, sf_dir)["windowed"]
    return windowed.select(
        F.col("date"),
        fmt_month_abbrev(F.col("date")).alias("date_pretty"),
        F.col("snippet_html"),
        F.col("sourceName"),
        F.col("url").alias("sourceUrl"),
        body_already_has_source(
            F.col("snippet_html"), F.col("url"), F.col("sourceName")
        ).alias("suppressSource"),
    )


_FLAGSHIP_ORACLE = r"""
WITH parsed AS (
    SELECT
        doc_id AS pos,
        trim(regexp_replace(coalesce(substring(text, 1, 30), ''), '\s+', ' ', 'g')) AS title,
        DATE '2024-01-01' + CAST(doc_id % 60 AS INT) AS date,
        'https://' || source || '.example.com/item' AS url,
        source AS sourceName,
        doc_id
    FROM documents
),
admitted AS (
    SELECT * FROM parsed WHERE length(title) >= 15
),
snip AS (
    SELECT *,
        title || ' <a href="'
            || CASE WHEN doc_id % 3 = 0 THEN url ELSE url || '/x' END
            || '">'
            || CASE WHEN doc_id % 2 = 0 THEN sourceName ELSE 'Other' END
            || '</a>' AS snippet_html
    FROM admitted
),
deduped AS (
    SELECT *
    FROM (
        SELECT *,
            row_number() OVER (
                PARTITION BY CAST(date AS VARCHAR) || '::' || substring(title, 1, 120) || '::' || url
                ORDER BY date DESC, pos
            ) AS __rn
        FROM snip
    )
    WHERE __rn = 1
),
windowed AS (
    SELECT *
    FROM (
        SELECT *, row_number() OVER (ORDER BY date DESC, pos) AS __gn
        FROM deduped
    )
    WHERE __gn BETWEEN 2 AND 9
)
SELECT
    date,
    list_value('Jan.','Feb.','Mar.','Apr.','May','Jun.','Jul.','Aug.','Sep.','Oct.','Nov.','Dec.')[month(date)]
        || ' ' || CAST(day(date) AS VARCHAR) || ', ' || CAST(year(date) AS VARCHAR) AS date_pretty,
    snippet_html,
    sourceName,
    url AS sourceUrl,
    (url <> ''
     AND regexp_extract(snippet_html, '(?i)<a[^>]*href="([^"]+)"[^>]*>([^<]+)</a>\s*$', 1) <> ''
     AND (regexp_replace(regexp_extract(snippet_html, '(?i)<a[^>]*href="([^"]+)"[^>]*>([^<]+)</a>\s*$', 1), '/+$', '')
              = regexp_replace(url, '/+$', '')
          OR lower(trim(regexp_replace(regexp_extract(snippet_html, '(?i)<a[^>]*href="([^"]+)"[^>]*>([^<]+)</a>\s*$', 2), '\s+', ' ', 'g')))
              = lower(trim(regexp_replace(sourceName, '\s+', ' ', 'g'))))
    ) AS suppressSource
FROM windowed
"""


@query("flagship_pipeline", oracle=_FLAGSHIP_ORACLE)
def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline(spark, sf_dir)
