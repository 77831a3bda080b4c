"""Round-66 breadth batch: inequality-adjusted engagement, schema
null-rates trend, and the effective-context duplication factor.

- ``agg_engagement_gini`` — engagement concentration: the exact
  Gini of per-user event counts plus the top-1% activity share —
  "1% of users generate 30% of events" is the first number a
  rate-limit or abuse review asks for, and the mean alone hides it
  entirely.
- ``dq_null_rate_trend`` — per-day null-rate of the value column
  with the half-to-half delta — a null-rate step between halves is
  an upstream schema change that row counts never show.
- ``corpus_dup_inflation`` — the token-duplication inflation
  factor: total 5-gram occurrences over distinct 5-grams — the
  multiplier by which the corpus overstates its effective size
  (a 1.6x factor means "1 T tokens" is ~0.6 T tokens of signal),
  per source and overall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.operators.windows import bucketed_rank_cumsum
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# agg_engagement_gini
# --------------------------------------------------------------------------


@query(
    "agg_engagement_gini",
    oracle="""
    WITH u AS (
        SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c, user_id) AS rk,
               count(*) OVER () AS n, sum(c) OVER () AS s
        FROM u
    ),
    g AS (
        SELECT max(n) AS n, max(s) AS s,
               sum((2 * rk - n - 1) * c) AS gnum
        FROM ranked
    ),
    top AS (
        SELECT sum(c) AS top_c
        FROM ranked WHERE rk > n - (n + 99) // 100
    )
    SELECT CAST(g.n AS BIGINT) AS n_users,
           CAST(g.s AS BIGINT) AS n_events,
           CAST((2000000 * g.gnum + g.n * g.s) // (2 * g.n * g.s)
               AS BIGINT) AS gini_micro,
           CAST((2000000 * top.top_c + g.s) // (2 * g.s)
               AS BIGINT) AS top1pct_share_micro
    FROM g CROSS JOIN top
    """,
)
def agg_engagement_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement concentration: the exact Gini of per-user event
    counts via the rank identity G = Σ(2r - n - 1)c / (nΣc) — every
    term integer, one integral micro division — plus the share of
    all events produced by the top ceil(1%) of users. Together they
    answer the abuse/rate-limit question the mean hides: a Gini
    near 0.8 with a fat top-1% share means the platform's 'traffic'
    is a handful of accounts, and per-user limits will barely dent
    aggregate load.

    Scale: user-grain fold (localCheckpointed once — the operator's
    bounds/local/offsets branches then reread it instead of re-folding
    events), ranks from the bucketed two-pass cumsum
    (operators/windows.py:bucketed_rank_cumsum — no data-scaled
    single-partition window; bit-identical integer ranks), two one-row
    folds. Converted from the global Window.orderBy form in round 10
    (the ledger's entity class)."""
    u = (
        io.load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    ranked = bucketed_rank_cumsum(
        u, order_key="c", tiebreak="user_id", value_col="c"
    ).select("c", "rk", "n", F.col("total").alias("s"))
    g = ranked.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(
            (2 * F.col("rk") - F.col("n") - 1) * F.col("c")
        ).alias("gnum"),
    )
    top = ranked.filter(
        F.col("rk")
        > F.col("n") - F.floor((F.col("n") + 99) / 100)
    ).agg(F.sum("c").alias("top_c"))
    return g.crossJoin(F.broadcast(top)).select(
        F.col("n").cast("long").alias("n_users"),
        F.col("s").cast("long").alias("n_events"),
        # gnum is QUADRATIC (rank-weighted count sum) and n*s is
        # users x events; DuckDB computes both in HUGEINT — widened to
        # DECIMAL(38,0) on the Spark side (registry.py envelope note)
        F.expr(
            "CAST((2000000 * CAST(gnum AS DECIMAL(38,0))"
            " + CAST(n AS DECIMAL(38,0)) * s)"
            " DIV (2 * CAST(n AS DECIMAL(38,0)) * s) AS BIGINT)"
        ).alias("gini_micro"),
        F.expr(
            "CAST((2000000 * CAST(top_c AS DECIMAL(38,0)) + s)"
            " DIV (2 * s) AS BIGINT)"
        ).alias("top1pct_share_micro"),
    )


# --------------------------------------------------------------------------
# dq_null_rate_trend
# --------------------------------------------------------------------------


@query(
    "dq_null_rate_trend",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0,
               max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d1
        FROM events
    ),
    daily AS (
        SELECT CAST(CAST(e.ts AS TIMESTAMP) AS DATE) AS day,
               CASE WHEN date_diff('day', b.d0,
                        CAST(CAST(e.ts AS TIMESTAMP) AS DATE))
                         >= date_diff('day', b.d0, b.d1) // 2
                    THEN 1 ELSE 0 END AS half,
               count(*) AS n,
               sum(CASE WHEN e.value IS NULL THEN 1 ELSE 0 END)
                   AS n_null
        FROM events e CROSS JOIN bounds b
        GROUP BY 1, 2
    ),
    halves AS (
        SELECT half, sum(n) AS n, sum(n_null) AS n_null
        FROM daily GROUP BY half
    )
    SELECT day,
           CAST(n AS BIGINT) AS n,
           CAST(n_null AS BIGINT) AS n_null,
           CAST((2000000 * n_null + n) // (2 * n) AS BIGINT)
               AS null_micro,
           CAST((SELECT (2000000 * n_null + n) // (2 * n)
                 FROM halves WHERE half = 1)
                - (SELECT (2000000 * n_null + n) // (2 * n)
                   FROM halves WHERE half = 0) AS BIGINT)
               AS half_delta_micro
    FROM daily
    """,
)
def dq_null_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-rate trend for the value column: per-day null share in
    integral micro units, with the second-half-minus-first-half
    delta on every row (tz-invariant date split). Null rates step
    when an upstream producer changes schema or a parser starts
    swallowing a field — and row counts, the thing everyone
    monitors, don't move at all; the half-delta is the one number
    to alert on.

    Scale: one fact pass to day-grain null censuses (map-side
    partials); the halves fold is 2 rows."""
    ev = io.load_events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    daily = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.col("ts").cast("date").alias("day"),
            F.when(
                F.datediff(F.col("ts").cast("date"), F.col("d0"))
                >= F.expr("datediff(d1, d0) div 2"),
                1,
            )
            .otherwise(0)
            .alias("half"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("value").isNull(), 1).otherwise(0)
            ).alias("n_null"),
        )
        .localCheckpoint()
    )
    halves = daily.groupBy("half").agg(
        F.sum("n").alias("hn"), F.sum("n_null").alias("hnull")
    )
    h = halves.agg(
        F.max(
            F.when(
                F.col("half") == 1,
                F.expr("(2000000 * hnull + hn) div (2 * hn)"),
            )
        ).alias("r1"),
        F.max(
            F.when(
                F.col("half") == 0,
                F.expr("(2000000 * hnull + hn) div (2 * hn)"),
            )
        ).alias("r0"),
    )
    return daily.crossJoin(F.broadcast(h)).select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.expr("(2000000 * n_null + n) div (2 * n)").alias(
            "null_micro"
        ),
        (F.col("r1") - F.col("r0"))
        .cast("long")
        .alias("half_delta_micro"),
    )


# --------------------------------------------------------------------------
# corpus_dup_inflation
# --------------------------------------------------------------------------


@query(
    "corpus_dup_inflation",
    oracle="""
    WITH tok AS (
        SELECT source, doc_id, t, row_number() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS idx
        FROM (
            SELECT source, doc_id, u.t, u.pos
            FROM documents,
                 LATERAL (SELECT unnest(string_split(text, ' ')) AS t,
                          generate_subscripts(
                              string_split(text, ' '), 1) AS pos) u
        )
    ),
    grams AS (
        SELECT a.source,
               md5(a.t || ' ' || b.t || ' ' || c.t || ' '
                   || d.t || ' ' || e.t) AS g
        FROM tok a
        JOIN tok b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
        JOIN tok c ON c.doc_id = a.doc_id AND c.idx = a.idx + 2
        JOIN tok d ON d.doc_id = a.doc_id AND d.idx = a.idx + 3
        JOIN tok e ON e.doc_id = a.doc_id AND e.idx = a.idx + 4
    ),
    per_source AS (
        SELECT source, count(*) AS total,
               count(DISTINCT g) AS uniq
        FROM grams GROUP BY source
        UNION ALL
        SELECT '_all_', count(*), count(DISTINCT g) FROM grams
    )
    SELECT source,
           CAST(total AS BIGINT) AS total_grams,
           CAST(uniq AS BIGINT) AS unique_grams,
           (2000 * total + uniq) // (2 * uniq) AS inflation_milli
    FROM per_source
    """,
)
def corpus_dup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplication inflation factor: total 5-gram occurrences
    over distinct 5-grams, per source and for the whole corpus
    ('_all_' row), in half-up milli units. Inflation 1000 means
    every 5-gram is unique; 1600 means the corpus claims 1.6 tokens
    for every token of actual signal — the honest deflator to apply
    before comparing 'dataset sizes', and per source it names WHO
    ships the boilerplate (cross-referencing
    corpus_dedup_rate_dashboard's corpus-level 5-gram number).

    Scale: keyed position joins build grams once; two distinct-
    count folds (per source + overall) with map-side partials."""
    tok = io.load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("idx", "t"),
    )
    joined = tok.alias("a")
    for i, al in enumerate(("b", "c", "d", "e"), start=1):
        joined = joined.join(
            tok.select(
                F.col("doc_id").alias(f"{al}_d"),
                F.col("idx").alias(f"{al}_i"),
                F.col("t").alias(f"{al}_t"),
            ),
            (F.col("a.doc_id") == F.col(f"{al}_d"))
            & (F.col(f"{al}_i") == F.col("a.idx") + i),
        )
    grams = joined.select(
        F.col("a.source").alias("source"),
        F.md5(
            F.concat_ws(
                " ",
                F.col("a.t"),
                F.col("b_t"),
                F.col("c_t"),
                F.col("d_t"),
                F.col("e_t"),
            )
        ).alias("g"),
    ).localCheckpoint()
    per_source = grams.groupBy("source").agg(
        F.count("*").alias("total"),
        F.countDistinct("g").alias("uniq"),
    )
    overall = grams.agg(
        F.lit("_all_").alias("source"),
        F.count("*").alias("total"),
        F.countDistinct("g").alias("uniq"),
    )
    return per_source.unionAll(overall).select(
        "source",
        F.col("total").cast("long").alias("total_grams"),
        F.col("uniq").cast("long").alias("unique_grams"),
        # nullif: the ungrouped '_all_' row has uniq=0 on an empty corpus
        # and DuckDB's `// 0` is NULL while `div 0` raises under ANSI
        # (r9 sf0 audit; per-source groups always have uniq >= 1)
        F.expr(
            "(2000 * total + uniq) div (2 * nullif(uniq, 0))"
        ).alias("inflation_milli"),
    )
