"""Core relational operators (SURVEY.md §2.B: projection/filter, sort/limit,
set ops, dedup; generalizes §2.A rows 2, 9, 13-18, 24).

All pure DataFrame built-ins — Catalyst pushes the filters/projections into
the parquet scan (PushedFilters/ReadSchema visible in .explain) and AQE
sizes the shuffles; nothing here needs a repartition hint at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.operators import dedup_first_wins
from hh_rumors_presto_spark.registry import query


@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS id,
           c_name AS name,
           upper(c_mktsegment) AS segment,
           c_acctbal * 1.1 AS adj_bal,
           c_nationkey AS nation
    FROM customer
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select / rename / derived columns (ref #18, fetchRumors.js:202-209)."""
    return io.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.upper("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") * 1.1).alias("adj_bal"),
        F.col("c_nationkey").alias("nation"),
    )


@query(
    "filter_conj",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity > 25
      AND l_shipdate IS NOT NULL
      AND l_extendedprice BETWEEN 10000 AND 60000
    """,
)
def filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter conjunction with IN-list / range / null predicates (ref #9,
    fetchRumors.js:99-101). All four predicates reach the parquet scan as
    PushedFilters."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") > 25)
        & F.col("l_shipdate").isNotNull()
        & F.col("l_extendedprice").between(10000, 60000)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hot'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
                ELSE 'cold' END AS tier,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_bucket
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection (ref #24, index.html:52-61)."""
    orders = io.load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "hot")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "warm")
        .otherwise("cold")
        .alias("tier"),
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
    )


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, tp
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_totalprice END AS tp
        FROM orders
    )
    ORDER BY tp DESC NULLS FIRST, o_orderkey
    LIMIT 200
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort with explicit null placement + unique tiebreaker (ref #15
    — the reference's comparator never returns 0, so its tie order is
    undefined; here the total order makes the LIMIT deterministic)."""
    orders = io.load_table(spark, sf_dir, "orders")
    tp = F.when(F.col("o_totalprice") < 50000, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        orders.select("o_orderkey", tp.alias("tp"))
        .orderBy(F.col("tp").desc_nulls_first(), F.col("o_orderkey"))
        .limit(200)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset+limit window (ref #17, fetchRumors.js:199 `slice(1,9)`).
    Native .offset/.limit — plans as partial top-k, not a global window."""
    orders = io.load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@query(
    "topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps + tiny driver merge, no full sort at any scale."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(50)
    )


@query(
    "set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL bag semantics (ref #14, fetchRumors.js:184-185) — the
    overlap between the two branches stays duplicated."""
    cust = io.load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionAll(b)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.subtract(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.exceptAll(b)


@query(
    "dedup_firstwin",
    oracle="""
    SELECT doc_id, source, lang
    FROM (
        SELECT doc_id, source, lang,
               row_number() OVER (
                   PARTITION BY source || '::' || substring(text, 1, 40)
                   ORDER BY doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn = 1
    """,
)
def dedup_firstwin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup on a composite key under an explicit total order
    (ref #13/#16, fetchRumors.js:141-148,189-196) — row_number()=1, never
    bare dropDuplicates where the survivor matters."""
    docs = io.load_table(spark, sf_dir, "documents")
    key = F.concat_ws("::", F.col("source"), F.substring("text", 1, 40))
    out = dedup_first_wins(docs, key, [F.col("doc_id")])
    return out.select("doc_id", "source", "lang")


@query(
    "array_ops",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[-1] AS last_token,
           len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS n_long,
           array_to_string(list_transform(string_split(text, ' ')[1:3], t -> upper(t)), '-') AS head3,
           list_contains(string_split(text, ' '), 'spark') AS has_spark
    FROM documents
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: split -> size/element_at/filter/transform/
    slice/contains (ref #2 split+trim+drop-empty and #11 last-anchor
    element_at(-1), fetchRumors.js:179,103-106)."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        F.concat_ws(
            "-", F.transform(F.slice(toks, 1, 3), lambda t: F.upper(t))
        ).alias("head3"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@query(
    "array_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating explode: one row per token (ref #2's split-into-rows
    reading; the UDTF shape of §2.B)."""
    docs = io.load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column
    (SURVEY.md §2.B map/JSON fns; envelope shape §1.2c)."""
    ev = io.load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    )
