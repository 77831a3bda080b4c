"""Round-58 breadth batch: DAU/WAU stickiness, casing profiles, and
leaderboard rank stability.

- ``agg_dau_mau`` — the stickiness ratio, weekly grain: mean daily
  active users over weekly active users per week, in exact micro
  units — the one engagement number (habit vs reach) every consumer
  product reports, done without a single float row-sum.
- ``text_casing_profile`` — the shouting/spam probe: per source,
  ALL-CAPS token share and Titlecase token share in exact micro
  units — a source whose caps share spikes started shipping spam or
  lost its casing in an encoding hop.
- ``dq_rank_stability`` — leaderboard churn between the stream's
  halves: supplier revenue ranks compared by Spearman footrule
  (Σ|Δrank|, exact) plus top-10 overlap — the "is this leaderboard
  signal or noise" gate before anyone ships incentives against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# agg_dau_mau
# --------------------------------------------------------------------------


@query(
    "agg_dau_mau",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               date_diff('day', DATE '1970-01-05',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7
                   AS wk
        FROM events
    ),
    dau AS (
        SELECT wk, day, count(*) AS dau FROM act GROUP BY wk, day
    ),
    wau AS (
        SELECT wk, count(DISTINCT user_id) AS wau FROM act GROUP BY wk
    ),
    daily AS (
        SELECT wk, sum(dau) AS dau_sum, count(*) AS n_days
        FROM dau GROUP BY wk
    )
    SELECT CAST(d.wk AS BIGINT) AS week_idx,
           CAST(d.n_days AS BIGINT) AS n_days,
           CAST(d.dau_sum AS BIGINT) AS dau_sum,
           CAST(w.wau AS BIGINT) AS wau,
           CAST((2000000 * d.dau_sum + d.n_days * w.wau)
               // (2 * d.n_days * w.wau) AS BIGINT) AS stickiness_micro
    FROM daily d JOIN wau w ON w.wk = d.wk
    """,
)
def agg_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness: mean DAU over WAU per Monday-anchored week
    — stickiness = (Σ daily distinct users / days) / weekly distinct
    users, as one half-up integral micro division of exact counts.
    1e6 means every weekly user shows up every day (habit); near
    1/7 of 1e6 means users touch once a week (reach without habit) —
    the single number that separates a daily product from a weekly
    one.

    Scale: one DISTINCT (user, day) collapse with map-side combine,
    then day- and week-grain folds — no windows over the fact."""
    act = io.load_events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.floor(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05")
            )
            / 7
        )
        .cast("long")
        .alias("wk"),
    ).distinct()
    dau = act.groupBy("wk", "day").agg(F.count("*").alias("dau"))
    wau = act.groupBy("wk").agg(
        F.countDistinct("user_id").alias("wau")
    )
    daily = dau.groupBy("wk").agg(
        F.sum("dau").alias("dau_sum"),
        F.count("*").alias("n_days"),
    )
    return daily.join(wau, "wk").select(
        F.col("wk").cast("long").alias("week_idx"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("dau_sum").cast("long").alias("dau_sum"),
        F.col("wau").cast("long").alias("wau"),
        F.expr(
            "(2000000 * dau_sum + n_days * wau)"
            " div (2 * n_days * wau)"
        ).alias("stickiness_micro"),
    )


# --------------------------------------------------------------------------
# text_casing_profile
# --------------------------------------------------------------------------


@query(
    "text_casing_profile",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS t
        FROM documents
    ),
    sig AS (
        SELECT source,
               CASE WHEN length(t) >= 2
                     AND regexp_full_match(t, '[A-Z]+')
                    THEN 1 ELSE 0 END AS is_caps,
               CASE WHEN regexp_full_match(t, '[A-Z][a-z]+')
                    THEN 1 ELSE 0 END AS is_title
        FROM tok WHERE t <> ''
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(is_caps) AS BIGINT) AS n_allcaps,
           CAST(sum(is_title) AS BIGINT) AS n_titlecase,
           CAST((2000000 * sum(is_caps) + count(*)) // (2 * count(*))
               AS BIGINT) AS caps_micro,
           CAST((2000000 * sum(is_title) + count(*)) // (2 * count(*))
               AS BIGINT) AS title_micro
    FROM sig GROUP BY source
    """,
)
def text_casing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casing profile per source: ALL-CAPS token share (length >= 2,
    pure A-Z — the shouting/spam signature) and Titlecase share
    (headline/proper-noun density), both as exact integral micro
    rates. A source whose caps share jumps started shipping spam or
    dropped through a case-destroying encoding hop; one whose
    titlecase share collapses probably switched from headlines to
    body text — either way the CONTENT changed while the row counts
    stayed flat, which is exactly what volume monitors miss.

    Scale: one token pass with regexp flags, a source-grain fold —
    map-side partials throughout."""
    tok = io.load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    sig = tok.select(
        "source",
        F.when(
            (F.length("t") >= 2) & F.col("t").rlike("^[A-Z]+$"), 1
        )
        .otherwise(0)
        .alias("is_caps"),
        F.when(F.col("t").rlike("^[A-Z][a-z]+$"), 1)
        .otherwise(0)
        .alias("is_title"),
    )
    return sig.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.sum("is_caps").cast("long").alias("n_allcaps"),
        F.sum("is_title").cast("long").alias("n_titlecase"),
        F.expr(
            "(2000000 * sum(is_caps) + count(*)) div (2 * count(*))"
        ).alias("caps_micro"),
        F.expr(
            "(2000000 * sum(is_title) + count(*)) div (2 * count(*))"
        ).alias("title_micro"),
    )


# --------------------------------------------------------------------------
# dq_rank_stability
# --------------------------------------------------------------------------


@query(
    "dq_rank_stability",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(o_orderdate AS DATE)) AS d0,
               max(CAST(o_orderdate AS DATE)) AS d1
        FROM orders
    ),
    rev AS (
        SELECT l.l_suppkey AS supp,
               CASE WHEN date_diff('day', b.d0,
                                   CAST(o.o_orderdate AS DATE))
                         >= date_diff('day', b.d0, b.d1) // 2
                    THEN 1 ELSE 0 END AS half,
               sum(CAST(floor(l.l_extendedprice + 0.5) AS BIGINT))
                   AS dollars
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        CROSS JOIN bounds b
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT supp, half,
               row_number() OVER (PARTITION BY half
                                  ORDER BY dollars DESC, supp) AS rk
        FROM rev
    ),
    paired AS (
        SELECT a.supp, a.rk AS rk_a, b.rk AS rk_b
        FROM ranked a JOIN ranked b
          ON b.supp = a.supp AND a.half = 0 AND b.half = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(abs(rk_a - rk_b)) AS BIGINT) AS footrule,
           CAST((2000000 * sum(abs(rk_a - rk_b))
            + count(*) * count(*)) // (2 * count(*) * count(*))
               AS BIGINT) AS footrule_norm_micro,
           CAST(sum(CASE WHEN rk_a <= 10 AND rk_b <= 10
                    THEN 1 ELSE 0 END) AS BIGINT) AS top10_overlap
    FROM paired
    """,
)
def dq_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability between the stream's halves: supplier
    revenue ranks in each half (split at the midpoint of the DATE
    span — pure day arithmetic, timezone-invariant; dollars DESC,
    key tiebreak),
    compared by the Spearman FOOTRULE Σ|Δrank| — exact, selection-
    based, no float correlation needed — normalized by n² (its
    order-of-magnitude bound) in micro units, plus the top-10
    overlap count. A leaderboard whose footrule is large is ranking
    noise; shipping supplier incentives against it would reward
    variance, not performance — this is the gate that says so.

    Scale: revenue collapses to (supplier, half) grain; rank
    windows are keyed by half over supplier-cardinality rows; the
    pair join is supplier-sized."""
    bounds = io.load_table(spark, sf_dir, "orders").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    li = io.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    orders = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(bounds))
        .groupBy(
            F.col("l_suppkey").alias("supp"),
            F.when(
                F.datediff(
                    F.col("o_orderdate").cast("date"), F.col("d0")
                )
                >= F.expr(
                    "datediff(d1, d0) div 2"
                ),
                1,
            )
            .otherwise(0)
            .alias("half"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") + 0.5).cast("long")
            ).alias("dollars")
        )
    )
    wr = Window.partitionBy("half").orderBy(
        F.col("dollars").desc(), "supp"
    )
    ranked = rev.select(
        "supp", "half", F.row_number().over(wr).alias("rk")
    )
    a = ranked.filter(F.col("half") == 0).select(
        "supp", F.col("rk").alias("rk_a")
    )
    b = ranked.filter(F.col("half") == 1).select(
        F.col("supp").alias("sb"), F.col("rk").alias("rk_b")
    )
    paired = a.join(b, F.col("supp") == F.col("sb"))
    return paired.agg(
        F.count("*").alias("n_common"),
        F.sum(F.abs(F.col("rk_a") - F.col("rk_b")))
        .cast("long")
        .alias("footrule"),
        # the footrule sum is QUADRATIC in n (<= n^2/2), so 2000000*num
        # passes 2^63 near n~48M entities; DuckDB's sum() side is
        # HUGEINT — widen the Spark numerator (registry.py envelope note)
        F.expr(
            "CAST((2000000 * CAST(sum(abs(rk_a - rk_b)) AS DECIMAL(38,0))"
            " + count(*) * count(*))"
            " DIV (2 * count(*) * count(*)) AS BIGINT)"
        ).alias("footrule_norm_micro"),
        F.sum(
            F.when((F.col("rk_a") <= 10) & (F.col("rk_b") <= 10), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("top10_overlap"),
    )
