"""Breadth batch 3: array higher-order functions, inverted-index build,
scalable global row numbering, order-insensitive table checksums, and
embedding mean-pooling (SURVEY.md §2.B scalar/IR/scale-pattern rows).

Scale notes (100 TB posture):
- ``array_hof`` is pure per-row column expressions (whole-stage codegen,
  no shuffle, no UDF) — the lambda forms stay JVM-side.
- ``inverted_index`` is the classic IR build: explode fans out to one row
  per token occurrence, the groupBy partially aggregates map-side, and the
  posting list is capped at the aggregator so no unbounded array crosses
  the shuffle.
- ``global_row_number`` assigns a dense global rank WITHOUT a
  single-partition sort: range-bucket the key (deterministic arithmetic,
  not sampling), count per bucket (tiny agg), prefix-sum the bucket counts
  (window over #buckets rows — KBs, not data-scale), broadcast the offsets
  back, and row_number within each bucket. The only full-data exchange is
  the per-bucket window partition — same cost as any keyed window.
- ``table_checksum`` is an order-insensitive content fingerprint (sum of
  per-row 40-bit hashes + row count): pure map + partial-agg, one scalar
  per table — the cheap equality proof for CDC / replication audits.
- ``emb_mean_pool`` mean-pools vectors per label via posexplode →
  (label, dim) grouped sums — sums in DECIMAL so the reduction is exact
  and partitioning-order-insensitive (float sums are not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "array_hof",
    oracle="""
    WITH t AS (
        SELECT p_partkey, str_split(lower(p_name), ' ') AS arr
        FROM part WHERE p_partkey % 10 = 1
    )
    SELECT p_partkey,
           -- DuckDB: array_to_string of an empty list is NULL; Spark gives ''
           coalesce(array_to_string(list_transform(arr, x -> upper(x)), '|'), '')
               AS up,
           coalesce(array_to_string(list_filter(arr, x -> strlen(x) > 4), '|'), '')
               AS longw,
           CAST(list_sum(list_transform(arr, x -> strlen(x))) AS BIGINT)
               AS total_len,
           len(list_filter(arr, x -> x LIKE 'a%')) > 0 AS has_a
    FROM t
    """,
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions — transform / filter / aggregate /
    exists with lambda expressions. These run inside codegen (Catalyst
    compiles the lambdas); they are the idiomatic replacement for
    row-at-a-time UDFs over array columns."""
    part = io.load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 1)
    arr = F.split(F.lower(F.col("p_name")), " ")
    return part.select(
        "p_partkey",
        F.array_join(F.transform(arr, lambda x: F.upper(x)), "|").alias("up"),
        F.array_join(F.filter(arr, lambda x: F.length(x) > 4), "|").alias("longw"),
        F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("bigint")
        .alias("total_len"),
        F.exists(arr, lambda x: x.startswith("a")).alias("has_a"),
    )


@query(
    "inverted_index",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(str_split(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'),
                                ' ')) AS token
        FROM documents
    )
    SELECT token,
           count(DISTINCT doc_id) AS df,
           array_to_string(list_sort(list_distinct(list(doc_id)))[1:8], '|')
               AS postings_head
    FROM tok
    WHERE strlen(token) >= 3
    GROUP BY token
    HAVING count(DISTINCT doc_id) >= 20
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (token -> document-frequency + capped posting
    list): tokenize, explode, group by token. The posting head is capped
    (first 8 doc ids of the sorted set) INSIDE the aggregation so no
    unbounded list is materialized; full posting lists at scale would be
    written partitioned by token-hash instead of collected.

    r11 OPTIMIZATION (guide §2.4): df is now derived from the ONE
    collected doc-id set (size of the sorted set, cast back to the
    oracle's BIGINT) instead of a separate count_distinct — the old
    plan paid a (token, doc_id) dedup aggregate + exchange BEFORE the
    token aggregate + exchange; this shape is a single partial+final
    object-hash aggregate with ONE exchange (map-side partial sets
    dedupe locally). Same rows bit-for-bit (distinct count == set size).
    Warm sf0.1: 1.40s -> 0.33s, 2 Exchange -> 1."""
    docs = io.load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", " "), " ")
        ).alias("token"),
    ).filter(F.length("token") >= 3)
    return (
        tok.groupBy("token")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .select(
            "token",
            F.size("ds").cast("long").alias("df"),
            F.array_join(F.slice("ds", 1, 8), "|").alias("postings_head"),
        )
        .filter(F.col("df") >= 20)
    )


@query(
    "global_row_number",
    oracle="""
    SELECT o_orderkey,
           row_number() OVER (ORDER BY o_orderkey) AS rn
    FROM orders WHERE o_orderkey % 3 = 0
    """,
)
def global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global row numbers over a total order WITHOUT a
    single-partition sort (`row_number() OVER (ORDER BY ...)` collapses to
    one task at scale). Two-phase: deterministic range buckets on the key,
    per-bucket counts -> prefix-sum offsets (tiny, broadcast), then
    row_number within each bucket. Every full-data operation is
    partitioned by bucket."""
    orders = (
        io.load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey")
    )
    bucketed = orders.withColumn(
        "bucket", (F.col("o_orderkey") / F.lit(4096)).cast("bigint")
    )
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    # prefix sum over bucket counts: #buckets rows, not data-scale
    offsets = counts.select(
        "bucket",
        (
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna({"offset": 0})
    w = Window.partitionBy("bucket").orderBy("o_orderkey")
    return (
        bucketed.join(F.broadcast(offsets), "bucket")
        .select(
            "o_orderkey",
            (F.col("offset") + F.row_number().over(w)).cast("bigint").alias("rn"),
        )
    )


@query(
    "table_checksum",
    oracle="""
    SELECT tbl,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(h) AS DECIMAL(38,0)) AS VARCHAR) AS checksum
    FROM (
        SELECT 'orders' AS tbl,
               CAST('0x' || substring(
                   md5(concat_ws('|', CAST(o_orderkey AS VARCHAR),
                                      CAST(o_custkey AS VARCHAR),
                                      o_orderstatus)), 1, 10) AS BIGINT) AS h
        FROM orders
        UNION ALL
        SELECT 'lineitem' AS tbl,
               CAST('0x' || substring(
                   md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                      CAST(l_partkey AS VARCHAR),
                                      CAST(l_suppkey AS VARCHAR),
                                      CAST(l_linenumber AS VARCHAR))), 1, 10)
                   AS BIGINT) AS h
        FROM lineitem
    )
    GROUP BY tbl
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: per-row 40-bit md5 prefix,
    summed (exact DECIMAL accumulation) + row count, one row per table.
    Equal checksums <=> equal multisets of key columns — the constant-size
    proof used to audit CDC replays / replication. Pure map + partial agg;
    no shuffle wider than the 2-row final combine."""

    def fingerprint(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
                1,
                10,
            ),
            16,
            10,
        ).cast("bigint")
        return df.select(F.lit(tbl).alias("tbl"), h.alias("h"))

    orders = io.load_table(spark, sf_dir, "orders")
    lineitem = io.load_table(spark, sf_dir, "lineitem")
    rows = fingerprint(
        orders, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"]
    ).unionAll(
        fingerprint(
            lineitem,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        )
    )
    return rows.groupBy("tbl").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("h").cast("decimal(38,0)").cast("string").alias("checksum"),
    )


@query(
    "emb_mean_pool",
    oracle="""
    WITH flat AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS val
        FROM embeddings
    )
    SELECT label, pos,
           CAST(round(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
                      / count(*), 6) + 0.0 AS DOUBLE) AS mean_val,
           count(*) AS n
    FROM flat
    GROUP BY label, pos
    """,
)
def emb_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool embeddings per label (centroid construction): posexplode
    to (label, dim_pos, value), group, exact DECIMAL sums (float addition
    is order-sensitive; decimal is not, so the result is stable under any
    partitioning), one output row per (label, dim). Rebuilding the pooled
    array is a downstream array_agg ordered by pos.

    Cross-engine trap (caught by the all-keys fuzz sweep): DuckDB casts
    FLOAT -> DECIMAL through float32 arithmetic (~8 significant digits),
    Spark widens to double first — so both sides widen EXPLICITLY
    (CAST(val AS DOUBLE) first) before the decimal cast, and the rounded
    mean carries the + 0.0 signed-zero fold."""
    emb = io.load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("dval", F.col("val").cast("double").cast("decimal(18,9)"))
    # + 0.0 folds IEEE negative zero (a zero/tiny-negative dimension mean
    # rounds to -0.0 in DuckDB but +0.0 in Spark; fuzz seed 0 trips it)
    return flat.groupBy("label", "pos").agg(
        (F.round(F.sum("dval").cast("double") / F.count("*"), 6) + F.lit(0.0))
        .cast("double")
        .alias("mean_val"),
        F.count("*").alias("n"),
    )
