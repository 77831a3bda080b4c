"""The reference's final product: the rendered Presto block (SURVEY.md
§2.A rows 24-25 — buildFooterHTML's conditional projection and
buildPrestoHTML's ordered group-all fold, index.html:52-80) — plus a
data-quality audit operator generalizing its defensive checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "render_block",
    oracle=r"""
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
    admitted AS (SELECT * FROM parsed WHERE length(title) >= 15),
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
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY CAST(date AS VARCHAR) || '::' || substring(title, 1, 120) || '::' || url
                ORDER BY date DESC, pos) AS rn
            FROM snip
        ) WHERE rn = 1
    ),
    windowed AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (ORDER BY date DESC, pos) AS gn
            FROM deduped
        ) WHERE gn BETWEEN 2 AND 9
    ),
    items AS (
        SELECT pos, date,
            '<p>' || snippet_html || ' <em>— '
            || CASE WHEN url <> '' THEN
                   '<a href="' || url || '">' || sourceName || '</a>'
               ELSE sourceName END
            || ', ' ||
            list_value('Jan.','Feb.','Mar.','Apr.','May','Jun.','Jul.','Aug.','Sep.','Oct.','Nov.','Dec.')[month(date)]
              || ' ' || CAST(day(date) AS VARCHAR) || ', ' || CAST(year(date) AS VARCHAR)
            || '</em></p>' AS fragment
        FROM windowed
    )
    SELECT '<h3>More on the subject</h3>' || chr(10)
           || string_agg(fragment, chr(10) ORDER BY date DESC, pos) AS block,
           count(*) AS n_items
    FROM items
    """,
)
def render_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Presto block itself: per-item footer fragments (conditional
    source link, ref buildFooterHTML) folded into one ordered HTML string
    under a header (ref buildPrestoHTML). The fold is
    sort_array(collect_list(struct(order-key, fragment))) -> concat_ws —
    the deterministic form of an ordered string aggregation."""
    from hh_rumors_presto_spark.functions import fmt_month_abbrev
    from hh_rumors_presto_spark.queries.flagship import flagship_stages

    windowed = flagship_stages(spark, sf_dir)["windowed"]

    footer = F.when(
        F.col("url") != "",
        F.concat(
            F.lit('<a href="'), F.col("url"), F.lit('">'),
            F.col("sourceName"), F.lit("</a>"),
        ),
    ).otherwise(F.col("sourceName"))
    fragment = F.concat(
        F.lit("<p>"),
        F.col("snippet_html"),
        F.lit(" <em>— "),
        footer,
        F.lit(", "),
        fmt_month_abbrev(F.col("date")),
        F.lit("</em></p>"),
    )
    items = windowed.select("pos", "date", fragment.alias("fragment"))
    # ordered group-all fold: date DESC, pos ASC -> negate keys for the
    # ascending sort_array
    ordered = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.date_diff(F.col("date"), F.lit("2024-01-01").cast("date"))).alias("k1"),
                    F.col("pos").alias("k2"),
                    F.col("fragment").alias("fragment"),
                )
            )
        ),
        lambda s: s["fragment"],
    )
    # zero admitted items must yield NULL block (the oracle's string_agg
    # over zero rows is NULL and '...' || NULL propagates), not header+"".
    agged = items.agg(
        F.concat_ws("\n", ordered).alias("body"),
        F.count("*").alias("n_items"),
    )
    return agged.select(
        F.when(
            F.col("n_items") > 0,
            F.concat(F.lit("<h3>More on the subject</h3>\n"), F.col("body")),
        ).alias("block"),
        "n_items",
    )


@query(
    "dq_checks",
    oracle="""
    SELECT 'orders_null_custkey' AS check_name,
           count(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_price',
           count(CASE WHEN o_totalprice <= 0 THEN 1 END)
    FROM orders
    UNION ALL
    SELECT 'lineitem_discount_range',
           count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
    FROM lineitem
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    FROM (SELECT 1)
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: null/range constraint counts plus a referential-
    integrity anti-join (orders -> customer) — the validation suite a
    corpus-build pipeline runs before publishing, as one unioned report."""
    orders = io.load_table(spark, sf_dir, "orders")
    li = io.load_table(spark, sf_dir, "lineitem")
    cust = io.load_table(spark, sf_dir, "customer")
    checks = [
        orders.agg(
            F.lit("orders_null_custkey").alias("check_name"),
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("violations"),
        ),
        orders.agg(
            F.lit("orders_nonpositive_price").alias("check_name"),
            F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("violations"),
        ),
        li.agg(
            F.lit("lineitem_discount_range").alias("check_name"),
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            ).alias("violations"),
        ),
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti").agg(
            F.lit("orders_orphan_custkey").alias("check_name"),
            F.count("*").alias("violations"),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out
