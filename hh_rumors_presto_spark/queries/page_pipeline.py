"""Composed tag-page extraction (SURVEY.md §2.A row 6 — the reference's
``parseTagPage``, fetchRumors.js:75-124).

``extract_page_items`` closes the one partially-covered reference row: the
raw-HTML-page -> item-rows extractor, composed of the container fallback
chain, the date forward-fill element walk, the admission filter, the
last-anchor projection, and the paragraphHTML sanitize — all previously
present only as separate pieces.

Test construction: deterministic synthetic tag pages are built in-plan
from the ``documents`` fixture (10 docs per page) with every structural
edge the reference handles:

- container varies per page (main / #content / .content / .container /
  bare body) with an out-of-container decoy block that must never produce
  rows (container-selection proof);
- date headings are emitted only when the item date changes (and, on
  every 6th page starting at 2, NOT before the first item — whose rows
  must then be rejected for lacking a current date): forward-fill proof;
- items rotate through <p> vs <ul><li>, bold-wrapped lead words
  (sanitizer flatten proof), no/single/double anchors (last-anchor and
  HoopsHype-default proof), and sub-15-char texts (length gate proof).

Because the construction is a pure column expression over ``documents``,
the DuckDB oracle can predict the extractor's exact output rows without
parsing any HTML — a full value-hash check over the composed operator.

Scale shape: page parsing is an Arrow-batched pandas UDF over independent
page rows — no cross-page state, so the stage is embarrassingly parallel
at any corpus size; the generation groupBy is test scaffolding (real
pages arrive as source rows).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.functions.page_extract import parse_tag_page
from hh_rumors_presto_spark.registry import query

_MONTHS = (
    "January February March April May June July August September "
    "October November December"
).split()

_ITEM_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("title", T.StringType()),
            T.StructField("snippet_html", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("source_name", T.StringType()),
            T.StructField("date_iso", T.StringType()),
            T.StructField("last_anchor_text", T.StringType()),
        ]
    )
)


@F.pandas_udf(_ITEM_TYPE)
def _parse_pages_udf(html: pd.Series) -> pd.Series:
    return html.map(parse_tag_page)


def build_synthetic_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(page_id BIGINT, html STRING) — deterministic tag pages from the
    documents fixture; see module docstring for the embedded edge cases."""
    docs = io.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sl = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.substring(F.coalesce("text", F.lit("")), 1, 40),
                "[^A-Za-z0-9 ]",
                "",
            ),
            " +",
            " ",
        )
    )
    rest = F.concat(
        F.lit(" item "),
        F.col("doc_id").cast("string"),
        F.lit(" reports"),
        F.when(sl == "", "").otherwise(F.concat(F.lit(" "), sl)),
    )
    label = F.concat(F.lit("Source "), (F.col("doc_id") % 10).cast("string"))
    url0 = F.concat(F.lit("https://ex.com/"), F.col("doc_id").cast("string"))
    a_src = F.concat(F.lit('<a href="'), url0, F.lit('">'), label, F.lit("</a>"))
    a_extra = F.concat(
        F.lit('<a href="https://ex.com/a/'),
        F.col("doc_id").cast("string"),
        F.lit('">Extra</a>'),
    )
    anchors = (
        F.when(F.col("doc_id") % 5 == 0, "")
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" "), a_extra, F.lit(" "), a_src),
        )
        .otherwise(F.concat(F.lit(" "), a_src))
    )
    lead = F.when(F.col("doc_id") % 2 == 0, "<b>Rumor</b>").otherwise("Rumor")
    inner = F.concat(lead, rest, anchors)
    item_html = F.when(F.col("doc_id") % 7 == 0, "<p>tiny</p>").otherwise(
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("<ul><li>"), inner, F.lit("</li></ul>")),
        ).otherwise(F.concat(F.lit("<p>"), inner, F.lit("</p>")))
    )

    grp = F.expr("(doc_id div 3) % 60")
    d = F.date_add(F.lit("2024-01-01").cast("date"), grp.cast("int"))
    heading = F.concat(
        F.lit("<h2>"),
        F.element_at(F.array(*[F.lit(m) for m in _MONTHS]), F.month(d)),
        F.lit(" "),
        F.dayofmonth(d).cast("string"),
        F.lit(", "),
        F.year(d).cast("string"),
        F.lit("</h2>"),
    )
    staged = docs.select(
        F.expr("doc_id div 10").alias("page_id"),
        (F.col("doc_id") % 10).alias("pos"),
        grp.alias("grp"),
        heading.alias("heading"),
        item_html.alias("item_html"),
    )
    w = Window.partitionBy("page_id").orderBy("pos")
    prev = F.lag("grp").over(w)
    emit = (prev.isNull() & (F.col("page_id") % 6 != 2)) | (
        prev.isNotNull() & (prev != F.col("grp"))
    )
    frag = F.concat(
        F.when(emit, F.col("heading")).otherwise(""), F.col("item_html")
    )
    copen = (
        F.when(F.col("page_id") % 5 == 0, "<main>")
        .when(F.col("page_id") % 5 == 1, '<div id="content">')
        .when(F.col("page_id") % 5 == 2, '<div class="content">')
        .when(F.col("page_id") % 5 == 3, '<div class="container">')
        .otherwise("")
    )
    cclose = (
        F.when(F.col("page_id") % 5 == 0, "</main>")
        .when(F.col("page_id") % 5 == 4, "")
        .otherwise("</div>")
    )
    decoy = F.when(
        F.col("page_id") % 5 == 4, ""
    ).otherwise(
        '<div class="extra"><h2>December 31, 1999</h2>'
        "<p>This decoy paragraph must never be parsed into output rows</p>"
        "</div>"
    )
    return (
        staged.select("page_id", frag.alias("frag"), F.col("pos"))
        .groupBy("page_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, frag)))"
                ", x -> x.frag), '')"
            ).alias("body_inner")
        )
        .select(
            "page_id",
            F.concat(
                F.lit(
                    "<html><head><title>Page</title></head><body>"
                    "<nav><p>menu</p></nav>"
                ),
                copen,
                F.col("body_inner"),
                cclose,
                decoy,
                F.lit("<footer><p>cr</p></footer></body></html>"),
            ).alias("html"),
        )
    )


@query(
    "extract_page_items",
    oracle="""
    WITH d0 AS (
        SELECT doc_id,
               doc_id // 10 AS page_id,
               DATE '2024-01-01' + CAST((doc_id // 3) % 60 AS INT) AS d,
               trim(regexp_replace(regexp_replace(
                   substring(coalesce(text, ''), 1, 40),
                   '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS sl
        FROM documents
    ),
    core AS (
        SELECT *,
               'Rumor item ' || doc_id || ' reports'
                   || CASE WHEN sl = '' THEN '' ELSE ' ' || sl END AS body,
               'Source ' || (doc_id % 10) AS label,
               'https://ex.com/' || doc_id AS url0
        FROM d0
    ),
    admitted AS (
        -- %7: sub-15-char text gate; first doc of every 6k+2 page: no
        -- date heading has been seen yet, so the item is rejected
        SELECT * FROM core
        WHERE doc_id % 7 <> 0
          AND NOT (page_id % 6 = 2 AND (doc_id // 3) = ((page_id * 10) // 3))
    )
    SELECT page_id,
           CAST(row_number() OVER (PARTITION BY page_id ORDER BY doc_id) - 1
                AS INT) AS item_pos,
           body || CASE WHEN doc_id % 5 = 0 THEN ''
                        WHEN doc_id % 3 = 0 THEN ' Extra ' || label
                        ELSE ' ' || label END AS title,
           body || CASE WHEN doc_id % 5 = 0 THEN ''
                        WHEN doc_id % 3 = 0 THEN
                            ' <a href="https://ex.com/a/' || doc_id
                            || '" target="_blank">Extra</a> <a href="'
                            || url0 || '" target="_blank">' || label || '</a>'
                        ELSE ' <a href="' || url0 || '" target="_blank">'
                            || label || '</a>' END AS snippet_html,
           CASE WHEN doc_id % 5 = 0 THEN '' ELSE url0 END AS url,
           CASE WHEN doc_id % 5 = 0 THEN 'HoopsHype' ELSE label END
               AS source_name,
           strftime(d, '%Y-%m-%d') AS date_iso,
           CASE WHEN doc_id % 5 = 0 THEN '' ELSE label END
               AS last_anchor_text
    FROM admitted
    """,
)
def extract_page_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the composed parseTagPage extractor over synthetic tag pages
    and return one row per admitted item in page-document order.

    The oracle reconstructs the expected rows arithmetically from the
    same fixture columns the pages were generated from — so container
    selection, date forward-fill, admission, sanitization, and
    last-anchor attribution are all value-hash-checked end to end."""
    pages = build_synthetic_pages(spark, sf_dir)
    return pages.select(
        "page_id",
        F.posexplode(_parse_pages_udf("html")).alias("item_pos", "it"),
    ).select(
        "page_id",
        "item_pos",
        F.col("it.title").alias("title"),
        F.col("it.snippet_html").alias("snippet_html"),
        F.col("it.url").alias("url"),
        F.col("it.source_name").alias("source_name"),
        F.col("it.date_iso").alias("date_iso"),
        F.col("it.last_anchor_text").alias("last_anchor_text"),
    )


_CRAWL_ORIGIN = "http://fixture.test"
_CRAWL_SLUG = "synthetic_tag"
_CRAWL_ERROR_PAGE = 9  # 500 here: the crawl must keep pages 1..8
_CRAWL_REDIRECT_PAGE = 3  # 302 hop here: redirect-follow proof


@query(
    "scan_http_crawl",
    oracle="""
    WITH d0 AS (
        SELECT doc_id,
               doc_id // 10 AS page_id,
               DATE '2024-01-01' + CAST((doc_id // 3) % 60 AS INT) AS d,
               trim(regexp_replace(regexp_replace(
                   substring(coalesce(text, ''), 1, 40),
                   '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS sl
        FROM documents
    ),
    core AS (
        SELECT *,
               'Rumor item ' || doc_id || ' reports'
                   || CASE WHEN sl = '' THEN '' ELSE ' ' || sl END AS body,
               'Source ' || (doc_id % 10) AS label,
               'https://ex.com/' || doc_id AS url0
        FROM d0
    ),
    admitted AS (
        SELECT * FROM core
        WHERE doc_id % 7 <> 0
          AND NOT (page_id % 6 = 2 AND (doc_id // 3) = ((page_id * 10) // 3))
          -- the 500 at crawl page 9 stops the scan: only pages 1..8
          -- (page_id 0..7) are ever fetched, partial results kept
          AND page_id < 8
    )
    SELECT page_id,
           CAST(row_number() OVER (PARTITION BY page_id ORDER BY doc_id) - 1
                AS INT) AS item_pos,
           body || CASE WHEN doc_id % 5 = 0 THEN ''
                        WHEN doc_id % 3 = 0 THEN ' Extra ' || label
                        ELSE ' ' || label END AS title,
           CASE WHEN doc_id % 5 = 0 THEN '' ELSE url0 END AS url,
           CASE WHEN doc_id % 5 = 0 THEN 'HoopsHype' ELSE label END
               AS source_name,
           strftime(d, '%Y-%m-%d') AS date_iso
    FROM admitted
    """,
)
def scan_http_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full fetch contract against an in-process fixture
    transport: Basic-Auth header config (the fixture 401s without it),
    spoofed UA, redirect-follow (crawl page 3 is served via a 302 hop),
    non-2xx throw -> stop-scan-keep-partial (page 9 returns 500, so
    pages 1..8 survive), per-item dedup and caps
    (fetchRumors.js:14-56,126-151).

    The fixture pages are the same deterministic synthetic tag pages as
    extract_page_items, so the oracle predicts the exact surviving rows.
    The driver-side page dict is fixture-SERVER setup (12 small HTML
    strings), not a data-path collect; in deployment the transport is a
    real GET and pages land as source rows."""
    from hh_rumors_presto_spark.sources.http_transport import (
        crawl_tag,
        dict_transport,
        page_url,
    )

    served = {
        int(r["page_id"]): r["html"]
        for r in build_synthetic_pages(spark, sf_dir)
        .filter(F.col("page_id") < 12)
        .collect()
    }
    pages: dict[str, tuple[int, dict[str, str], str]] = {}
    for page_id, html in served.items():
        page = page_id + 1
        url = page_url(_CRAWL_ORIGIN, _CRAWL_SLUG, page)
        if page == _CRAWL_ERROR_PAGE:
            pages[url] = (500, {}, "server error")
        elif page == _CRAWL_REDIRECT_PAGE:
            moved = f"{_CRAWL_ORIGIN}/moved/{page}/"
            pages[url] = (302, {"location": moved}, "")
            pages[moved] = (200, {}, html)
        else:
            pages[url] = (200, {}, html)

    items, _debug = crawl_tag(
        dict_transport(pages), _CRAWL_ORIGIN, _CRAWL_SLUG, max_pages=10
    )
    rows = []
    pos_by_page: dict[int, int] = {}
    for it in items:
        page_id = it["page"] - 1
        pos = pos_by_page.get(page_id, 0)
        pos_by_page[page_id] = pos + 1
        rows.append(
            (
                page_id,
                pos,
                it["title"],
                it["url"],
                it["source_name"],
                it["date_iso"],
            )
        )
    return spark.createDataFrame(
        rows,
        schema="page_id long, item_pos int, title string, url string, "
        "source_name string, date_iso string",
    )


_BETA_SHIFT = 6  # beta's page 1 serves page_id 6: overlaps alpha on 6..7


@query(
    "flagship_from_html",
    oracle="""
    WITH d0 AS (
        SELECT doc_id,
               doc_id // 10 AS page_id,
               DATE '2024-01-01' + CAST((doc_id // 3) % 60 AS INT) AS d,
               trim(regexp_replace(regexp_replace(
                   substring(coalesce(text, ''), 1, 40),
                   '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS sl
        FROM documents
    ),
    core AS (
        SELECT *,
               'Rumor item ' || doc_id || ' reports'
                   || CASE WHEN sl = '' THEN '' ELSE ' ' || sl END AS body,
               'Source ' || (doc_id % 10) AS label,
               'https://ex.com/' || doc_id AS url0
        FROM d0
    ),
    admitted AS (
        -- alpha crawls page_id 0..7 (500 at its page 9), beta crawls
        -- page_id 6..15; the global date::title::url dedup collapses the
        -- 6..7 overlap, so the merged set is page_id 0..15 once each
        SELECT * FROM core
        WHERE doc_id % 7 <> 0
          AND NOT (page_id % 6 = 2 AND (doc_id // 3) = ((page_id * 10) // 3))
          AND page_id <= 15
    ),
    payload AS (
        SELECT strftime(d, '%Y-%m-%d') AS date_iso,
               list_extract(['Jan.','Feb.','Mar.','Apr.','May','Jun.',
                             'Jul.','Aug.','Sep.','Oct.','Nov.','Dec.'],
                            month(d))
                   || ' ' || day(d) || ', ' || year(d) AS date_pretty,
               body || CASE WHEN doc_id % 5 = 0 THEN ''
                            WHEN doc_id % 3 = 0 THEN
                                ' <a href="https://ex.com/a/' || doc_id
                                || '" target="_blank">Extra</a> <a href="'
                                || url0 || '" target="_blank">' || label
                                || '</a>'
                            ELSE ' <a href="' || url0
                                || '" target="_blank">' || label || '</a>'
                       END AS snippet_html,
               CASE WHEN doc_id % 5 = 0 THEN 'HoopsHype' ELSE label END
                   AS source_name,
               CASE WHEN doc_id % 5 = 0 THEN '' ELSE url0 END AS source_url,
               doc_id % 5 <> 0 AS suppress_source,
               body || CASE WHEN doc_id % 5 = 0 THEN ''
                            WHEN doc_id % 3 = 0 THEN ' Extra ' || label
                            ELSE ' ' || label END AS title
        FROM admitted
    )
    SELECT date_iso, date_pretty, snippet_html, source_name, source_url,
           suppress_source
    FROM payload
    ORDER BY date_iso DESC, title ASC
    LIMIT 8 OFFSET 1
    """,
)
def flagship_from_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference handler replayed from raw HTML
    (fetchRumors.js:174-218): two tag crawls over the fixture transport
    (alpha = pages 1..10 of page_id 0.., 500 at page 9; beta = the same
    corpus shifted so its pages overlap alpha on two page_ids), each page
    parsed by the composed extractor, then merge -> global
    date::title::url dedup (the overlap collapses) -> date-desc sort with
    a deterministic title tiebreak (the reference's JS comparator never
    returns 0, so equal-date order is implementation-defined there; a
    total order is required for a value-hash) -> skip the newest -> take
    8 -> final payload with fmtMonthAbbrev date_pretty and
    bodyAlreadyHasSource suppress_source — both the real column
    implementations, not re-derivations.

    This is the switch-over proof for a reference user: URL in, the
    reference's eight-item JSON payload out, every stage Spark-side
    except the driver-sequenced page fetch."""
    from hh_rumors_presto_spark.functions.dates import fmt_month_abbrev
    from hh_rumors_presto_spark.functions.strings import (
        body_already_has_source,
    )
    from hh_rumors_presto_spark.sources.http_transport import (
        crawl_tag,
        dict_transport,
        page_url,
    )

    served = {
        int(r["page_id"]): r["html"]
        for r in build_synthetic_pages(spark, sf_dir)
        .filter(F.col("page_id") < 16)
        .collect()
    }
    pages: dict[str, tuple[int, dict[str, str], str]] = {}
    for pid, html in served.items():
        # alpha: page n -> page_id n-1, with the 500 at page 9
        page_a = pid + 1
        url_a = page_url(_CRAWL_ORIGIN, "alpha", page_a)
        pages[url_a] = (
            (500, {}, "server error")
            if page_a == _CRAWL_ERROR_PAGE
            else (200, {}, html)
        )
        # beta: page n -> page_id n+5 (overlap with alpha on 6..7)
        page_b = pid + 1 - _BETA_SHIFT
        if 1 <= page_b <= 10:
            pages[page_url(_CRAWL_ORIGIN, "beta", page_b)] = (200, {}, html)

    transport = dict_transport(pages)
    rows = []
    for slug_idx, slug in enumerate(("alpha", "beta")):
        items, _dbg = crawl_tag(transport, _CRAWL_ORIGIN, slug, max_pages=10)
        for it in items:
            rows.append(
                (
                    slug_idx,
                    it["page"],
                    it["title"],
                    it["snippet_html"],
                    it["url"],
                    it["source_name"],
                    it["date_iso"],
                )
            )
    merged = spark.createDataFrame(
        rows,
        schema="slug_idx int, page int, title string, snippet_html string, "
        "url string, source_name string, date_iso string",
    )
    key = ["date_iso", "title", "url"]
    w = Window.partitionBy(
        F.col("date_iso"),
        F.substring("title", 1, 120),
        F.col("url"),
    ).orderBy("slug_idx", "page")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy(F.col("date_iso").desc(), F.col("title").asc())
        .offset(1)
        .limit(8)
        .select(
            "date_iso",
            fmt_month_abbrev(F.col("date_iso")).alias("date_pretty"),
            "snippet_html",
            "source_name",
            F.col("url").alias("source_url"),
            body_already_has_source(
                F.col("snippet_html"), F.col("url"), F.col("source_name")
            ).alias("suppress_source"),
        )
    )
