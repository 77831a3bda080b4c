"""String/date scalar-function queries (SURVEY.md §2.B "projection/filter/
scalar functions"; generalizes §2.A rows 3, 4, 8, 19, 23).

Each key exercises one scalar-function family over a fixture table, with the
DuckDB-equivalent SQL as oracle. Inputs are deliberately roughed up (padding,
tabs, diacritics, embedded dates) so the functions do real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.functions import (
    clean,
    extract_iso_date,
    fmt_month_abbrev,
    html_escape,
    slugify,
)
from hh_rumors_presto_spark.registry import query


@query(
    "str_clean",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(
               coalesce('  ' || text || chr(9) || ' x  y ', ''),
               '\s+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def str_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace normalization (ref clean, fetchRumors.js:32)."""
    docs = io.load_table(spark, sf_dir, "documents")
    messy = F.concat(F.lit("  "), F.col("text"), F.lit("\t x  y "))
    return docs.select(F.col("doc_id"), clean(messy).alias("cleaned"))


@query(
    "str_slugify",
    oracle="""
    SELECT c_custkey,
           trim(regexp_replace(regexp_replace(
               lower(strip_accents(c_name || ' Dončić & Café')),
               '&', ' and ', 'g'), '[^a-z0-9]+', '_', 'g'), '_') AS slug
    FROM customer
    """,
)
def str_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag slugification incl. NFD diacritic fold (ref fetchRumors.js:33-38).

    Pandas-UDF NFD fold + column-expression lower/replace chain; DuckDB's
    strip_accents is the oracle equivalent.
    """
    cust = io.load_table(spark, sf_dir, "customer")
    name = F.concat(F.col("c_name"), F.lit(" Dončić & Café"))
    return cust.select(F.col("c_custkey"), slugify(name).alias("slug"))


@query(
    "str_escape",
    oracle="""
    SELECT p_partkey,
           replace(replace(replace(replace(replace(
               '<a href="x">' || p_name || ' & ''co''',
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
               '"', '&quot;'), '''', '&#39;') AS escaped
    FROM part
    """,
)
def str_escape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML entity escaping (ref esc, index.html:49)."""
    part = io.load_table(spark, sf_dir, "part")
    raw = F.concat(F.lit('<a href="x">'), F.col("p_name"), F.lit(" & 'co'"))
    return part.select(F.col("p_partkey"), html_escape(raw).alias("escaped"))


@query(
    "str_extract_date",
    oracle="""
    SELECT o_orderkey,
           CAST(strptime(
               regexp_extract(
                   'shipped on ' || strftime(o_orderdate, '%B %-d, %Y') || ' priority',
                   '([A-Za-z]+\\s+\\d{1,2},\\s+\\d{4})', 1),
               '%B %-d, %Y') AS DATE) AS found_date
    FROM orders
    """,
)
def str_extract_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find-a-date-in-text (ref extractISODate, fetchRumors.js:41-50):
    round-trips o_orderdate through an English sentence."""
    orders = io.load_table(spark, sf_dir, "orders")
    sentence = F.concat(
        F.lit("shipped on "),
        F.date_format(F.col("o_orderdate"), "MMMM d, yyyy"),
        F.lit(" priority"),
    )
    return orders.select(
        F.col("o_orderkey"), extract_iso_date(sentence).alias("found_date")
    )


@query(
    "date_parse_fmt",
    oracle="""
    SELECT o_orderkey,
           list_value('Jan.','Feb.','Mar.','Apr.','May','Jun.',
                      'Jul.','Aug.','Sep.','Oct.','Nov.','Dec.')[month(o_orderdate)]
             || ' ' || CAST(day(o_orderdate) AS VARCHAR)
             || ', ' || CAST(year(o_orderdate) AS VARCHAR) AS date_pretty
    FROM orders
    """,
)
def date_parse_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonstandard month-abbrev formatting (ref fmtMonthAbbrev,
    fetchRumors.js:153-159 — May/Jun./Jul./Sep. defy date_format MMM)."""
    orders = io.load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey"),
        fmt_month_abbrev(F.col("o_orderdate")).alias("date_pretty"),
    )


@query(
    "date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 7 AS ship_by,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           year(o_orderdate) AS yr,
           quarter(o_orderdate) AS qtr,
           month(o_orderdate) AS mth
    FROM orders
    """,
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: add days/months, trunc, last_day, datediff,
    calendar extracts."""
    orders = io.load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        F.col("o_orderkey"),
        F.date_add(d, 7).alias("ship_by"),
        F.add_months(d, 3).alias("plus3m"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mth"),
    )


@query(
    "math_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(l_orderkey % 10 AS BIGINT) AS key_mod,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           power(l_quantity, 2) AS qty_sq,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar family. Per-row +,-,*,/ and sqrt are IEEE
    correctly-rounded -> bit-identical across engines (verified with the
    harness's VERIFY_EXACT_FLOATS mode); ln is libm-dependent (last-ulp
    differences between JVM and DuckDB), so it is rounded to 6 decimals on
    both sides. floor() is cast to BIGINT in the oracle because Spark's
    floor returns LONG while DuckDB's returns DOUBLE."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        (F.col("l_orderkey") % 10).alias("key_mod"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.pow(F.col("l_quantity"), 2).alias("qty_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "str_like",
    oracle="""
    SELECT p_partkey, p_name,
           p_name LIKE '%gold%' AS has_gold,
           p_name ILIKE '%GOLD%' AS has_gold_ci,
           regexp_matches(p_name, '^[a-z]+ [a-z]+') AS two_words
    FROM part
    WHERE p_name LIKE '%o%'
    """,
)
def str_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / RLIKE predicate family (the LIKE filter also pushes
    down to the parquet scan as StringContains)."""
    part = io.load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%o%")).select(
        "p_partkey",
        "p_name",
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.col("p_name").ilike("%GOLD%").alias("has_gold_ci"),
        F.col("p_name").rlike("^[a-z]+ [a-z]+").alias("two_words"),
    )


@query(
    "str_misc",
    oracle="""
    SELECT n_nationkey,
           lpad(n_name, 15, '.') AS padded,
           reverse(n_name) AS reversed,
           repeat('-', CAST(n_nationkey % 4 AS INT)) AS dashes,
           translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
           left(n_name, 3) AS prefix3,
           right(n_name, 2) AS suffix2
    FROM nation
    """,
)
def str_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining string-function family: pad/reverse/repeat/translate/
    left/right."""
    nat = io.load_table(spark, sf_dir, "nation")
    return nat.select(
        "n_nationkey",
        F.lpad("n_name", 15, ".").alias("padded"),
        F.reverse("n_name").alias("reversed"),
        F.repeat(F.lit("-"), (F.col("n_nationkey") % 4).cast("int")).alias("dashes"),
        F.translate("n_name", "AEIOU", "aeiou").alias("lowered_vowels"),
        F.substring("n_name", 1, 3).alias("prefix3"),
        F.col("n_name").substr(F.length("n_name") - 1, F.lit(2)).alias("suffix2"),
    )


@query(
    "null_fns",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
           o_totalprice IS NULL AS price_missing,
           ifnull(NULL, o_orderpriority) AS prio
    FROM orders
    """,
)
def null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif / coalesce / isNull / ifnull."""
    orders = io.load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_resolved"),
        F.col("o_totalprice").isNull().alias("price_missing"),
        F.ifnull(F.lit(None), F.col("o_orderpriority")).alias("prio"),
    )


@query(
    "str_extract_all",
    oracle="""
    SELECT p_partkey,
           -- DuckDB surfaces no-match as NULL where Spark gives []
           coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]+a[a-z]*'), '|'), '')
               AS a_words,
           coalesce(len(regexp_extract_all(p_name, '[a-z]+a[a-z]*')), 0) AS n_hits,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked
    FROM part
    WHERE p_partkey % 10 = 0
    """,
)
def str_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all (every match, not just the first) joined to a
    scalar, plus global regexp_replace — the multi-match half of the
    regexp surface (str_extract_date covers single-match extraction).
    Array output is pipe-joined (driver canonicalizer rule)."""
    part = io.load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    # idx=0 = whole match (Spark defaults to capture group 1, which this
    # groupless pattern doesn't have; DuckDB's default is already 0)
    hits = F.regexp_extract_all("p_name", F.lit("[a-z]+a[a-z]*"), 0)
    return part.select(
        "p_partkey",
        F.array_join(hits, "|").alias("a_words"),
        F.size(hits).alias("n_hits"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_masked"),
    )
