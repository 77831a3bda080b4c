"""Round-48 breadth batch: the causal-inference family —
difference-in-differences, stratified adjustment, and empirical-
Bayes shrinkage.

- ``ab_did_estimator`` — difference-in-differences over the
  hash-split cohorts and the stream's two halves: the causal
  workhorse when randomization isn't available, with the pre-period
  group gap reported alongside (the parallel-trends sniff test).
- ``ab_propensity_strata`` — stratified outcome comparison: users
  stratified by activity quintile (the observable confounder),
  treatment-vs-control purchase-rate gaps within each stratum, and
  the stratum-weighted pooled effect (over strata where both arms
  exist) — the adjustment that kills "treatment users were just
  more active" confounds.
- ``ab_eb_shrinkage`` — empirical-Bayes (beta-binomial,
  method-of-moments) shrinkage of per-user conversion rates toward
  the grand mean: the fix for every small-denominator leaderboard
  where a 1/1 user outranks a 95/100 one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.operators.windows import (
    bucketed_rank_cumsum,
    ntile_from_rank,
)
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# ab_did_estimator
# --------------------------------------------------------------------------


@query(
    "ab_did_estimator",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(ts AS TIMESTAMP)) AS t0,
               max(CAST(ts AS TIMESTAMP)) AS t1
        FROM events
    ),
    pts AS (
        SELECT user_id % 2 AS grp,
               CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(b.t0)
                         >= (epoch_us(b.t1) - epoch_us(b.t0)) // 2
                    THEN 1 ELSE 0 END AS post,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events e CROSS JOIN bounds b
    ),
    cell AS (
        SELECT grp, post, count(*) AS n, sum(y) AS c
        FROM pts GROUP BY grp, post
    ),
    rates AS (
        SELECT grp, post,
               CAST(n AS BIGINT) AS n,
               CAST((2000000 * c + n) // (2 * n) AS BIGINT) AS rate_micro
        FROM cell
    )
    SELECT CAST(grp AS BIGINT) AS grp,
           CAST(post AS BIGINT) AS post,
           n, rate_micro,
           CAST(sum(CASE WHEN grp = 1 AND post = 1 THEN rate_micro
                         WHEN grp = 1 AND post = 0 THEN -rate_micro
                         WHEN grp = 0 AND post = 1 THEN -rate_micro
                         ELSE rate_micro END) OVER () AS BIGINT)
               AS did_micro,
           CAST(sum(CASE WHEN post = 0 AND grp = 1 THEN rate_micro
                         WHEN post = 0 AND grp = 0 THEN -rate_micro
                         ELSE 0 END) OVER () AS BIGINT)
               AS pre_gap_micro
    FROM rates
    """,
)
def ab_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on purchase rates: treatment =
    odd-hash users, post = the stream's second half (split at the
    midpoint of the observed span), DiD = (T_post - T_pre) -
    (C_post - C_pre) over per-cell micro rates. The PRE-period group
    gap ships on every row — if it's large, parallel trends is
    already suspect and the DiD number shouldn't be trusted (that
    check is the whole discipline of the method). All four cell
    rates are half-up integral micro divisions of exact counts; the
    estimator is a signed sum of them.

    Scale: one fact pass to a 2x2 cell fold (map-side partials), a
    one-row bounds broadcast, windows over 4 rows."""
    ev = io.load_events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    pts = ev.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.unix_micros("ts") - F.col("t0")
            >= F.expr("(t1 - t0) div 2"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    cell = pts.groupBy("grp", "post").agg(
        F.count("*").alias("n"), F.sum("y").alias("c")
    )
    rates = cell.select(
        "grp",
        "post",
        F.col("n").cast("long").alias("n"),
        F.expr("(2000000 * c + n) div (2 * n)").alias("rate_micro"),
    )
    wt = Window.partitionBy()
    signed_did = F.when(
        (F.col("grp") == 1) & (F.col("post") == 1), F.col("rate_micro")
    ).when(
        (F.col("grp") == 1) & (F.col("post") == 0), -F.col("rate_micro")
    ).when(
        (F.col("grp") == 0) & (F.col("post") == 1), -F.col("rate_micro")
    ).otherwise(
        F.col("rate_micro")
    )
    signed_pre = F.when(
        (F.col("post") == 0) & (F.col("grp") == 1), F.col("rate_micro")
    ).when(
        (F.col("post") == 0) & (F.col("grp") == 0), -F.col("rate_micro")
    ).otherwise(F.lit(0))
    return rates.select(
        F.col("grp").cast("long").alias("grp"),
        F.col("post").cast("long").alias("post"),
        "n",
        "rate_micro",
        F.sum(signed_did).over(wt).cast("long").alias("did_micro"),
        F.sum(signed_pre).over(wt).cast("long").alias("pre_gap_micro"),
    )


# --------------------------------------------------------------------------
# ab_propensity_strata
# --------------------------------------------------------------------------


@query(
    "ab_propensity_strata",
    oracle="""
    WITH user_stats AS (
        SELECT user_id, user_id % 2 AS treat, count(*) AS activity,
               sum(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ),
    strat AS (
        SELECT *, ntile(5) OVER (ORDER BY activity, user_id)
                   AS stratum
        FROM user_stats
    ),
    cells AS (
        SELECT stratum,
               sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS n_t,
               sum(CASE WHEN treat = 1 THEN conv ELSE 0 END) AS c_t,
               sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS n_c,
               sum(CASE WHEN treat = 0 THEN conv ELSE 0 END) AS c_c,
               count(*) AS n_all
        FROM strat GROUP BY stratum
    ),
    scored AS (
        SELECT stratum, n_t, n_c, n_all,
               CASE WHEN n_t = 0 THEN NULL
                    ELSE (2000000 * c_t + n_t) // (2 * n_t) END
                   AS rate_t_micro,
               CASE WHEN n_c = 0 THEN NULL
                    ELSE (2000000 * c_c + n_c) // (2 * n_c) END
                   AS rate_c_micro
        FROM cells
    )
    SELECT CAST(stratum AS BIGINT) AS stratum,
           CAST(n_t AS BIGINT) AS n_treat,
           CAST(n_c AS BIGINT) AS n_control,
           CAST(rate_t_micro AS BIGINT) AS rate_t_micro,
           CAST(rate_c_micro AS BIGINT) AS rate_c_micro,
           CAST(rate_t_micro - rate_c_micro AS BIGINT)
               AS gap_micro,
           CAST(sum(CASE WHEN rate_t_micro IS NOT NULL
                          AND rate_c_micro IS NOT NULL
                         THEN n_all * (rate_t_micro - rate_c_micro)
                    END) OVER ()
                // sum(CASE WHEN rate_t_micro IS NOT NULL
                             AND rate_c_micro IS NOT NULL
                            THEN n_all END) OVER ()
                AS BIGINT) AS pooled_ate_micro
    FROM scored
    """,
)
def ab_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect adjustment: users are stratified
    into activity quintiles (the observable confounder — active
    users both convert more and differ across arms in any broken
    assignment), the treatment/control conversion-rate gap is
    computed WITHIN each stratum in exact micro units, and the
    pooled ATE weights the per-stratum gaps by stratum size
    (integral division). If the pooled number differs materially
    from the raw gap, activity was confounding the comparison —
    the 5-row readout that says so.

    Scale: one fact pass to user grain (localCheckpointed once); the
    quintile strata are NTILE computed closed-form from the bucketed
    two-pass rank (operators/windows.py:bucketed_rank_cumsum
    rank-only mode + ntile_from_rank — converted round 10,
    bit-identical to SQL-standard ntile), so no data-scaled
    single-partition window; a 5-row cell fold; windows over 5
    rows."""
    user_stats = (
        io.load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("activity"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .withColumn("treat", F.col("user_id") % 2)
        .localCheckpoint()
    )
    strat = bucketed_rank_cumsum(
        user_stats, order_key="activity", tiebreak="user_id"
    ).withColumn(
        "stratum", ntile_from_rank(F.col("rk"), F.col("n"), 5)
    )
    cells = strat.groupBy("stratum").agg(
        F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(
            F.when(F.col("treat") == 1, F.col("conv")).otherwise(0)
        ).alias("c_t"),
        F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(
            F.when(F.col("treat") == 0, F.col("conv")).otherwise(0)
        ).alias("c_c"),
        F.count("*").alias("n_all"),
    )
    scored = cells.select(
        "stratum",
        "n_t",
        "n_c",
        "n_all",
        F.expr(
            "CASE WHEN n_t = 0 THEN NULL"
            " ELSE (2000000 * c_t + n_t) div (2 * n_t) END"
        ).alias("rate_t_micro"),
        F.expr(
            "CASE WHEN n_c = 0 THEN NULL"
            " ELSE (2000000 * c_c + n_c) div (2 * n_c) END"
        ).alias("rate_c_micro"),
    )
    wt = Window.partitionBy()
    gap = F.col("rate_t_micro") - F.col("rate_c_micro")
    return scored.withColumn("gap_micro", gap).select(
        F.col("stratum").cast("long").alias("stratum"),
        F.col("n_t").cast("long").alias("n_treat"),
        F.col("n_c").cast("long").alias("n_control"),
        F.col("rate_t_micro").cast("long").alias("rate_t_micro"),
        F.col("rate_c_micro").cast("long").alias("rate_c_micro"),
        F.col("gap_micro").cast("long").alias("gap_micro"),
        F.expr(
            "CAST(sum(CASE WHEN gap_micro IS NOT NULL"
            " THEN n_all * gap_micro END) OVER ()"
            " div sum(CASE WHEN gap_micro IS NOT NULL"
            " THEN n_all END) OVER () AS BIGINT)"
        ).alias("pooled_ate_micro"),
    )


# --------------------------------------------------------------------------
# ab_eb_shrinkage
# --------------------------------------------------------------------------

_EB_TOP = 10


@query(
    "ab_eb_shrinkage",
    oracle=f"""
    WITH u AS (
        SELECT user_id, count(*) AS n,
               sum(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS c
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT count(*) AS k, sum(c) AS sc, sum(n) AS sn,
               sum((2000000 * c + n) // (2 * n)) AS sr,
               sum(CAST((2000000 * c + n) // (2 * n) AS DOUBLE)
                   * ((2000000 * c + n) // (2 * n))) AS srr
        FROM u
    ),
    prior AS (
        SELECT CAST(sc AS DOUBLE) / sn AS mu,
               greatest(
                   (srr / k - (CAST(sr AS DOUBLE) / k)
                              * (CAST(sr AS DOUBLE) / k))
                   / 1000000.0 / 1000000.0, 0.0000001) AS var_hat,
               k FROM m
    ),
    strength AS (
        SELECT mu,
               greatest(mu * (1.0 - mu) / var_hat - 1.0, 1.0)
                   AS m0
        FROM prior
    ),
    scored AS (
        SELECT u.user_id, u.n, u.c,
               (2000000 * u.c + u.n) // (2 * u.n) AS raw_micro,
               CAST(floor(1000000.0 * (u.c + s.m0 * s.mu)
                          / (u.n + s.m0) + 0.5) AS BIGINT)
                   AS shrunk_micro
        FROM u CROSS JOIN strength s
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n,
           CAST(c AS BIGINT) AS conversions,
           CAST(raw_micro AS BIGINT) AS raw_micro,
           shrunk_micro,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
                   ORDER BY shrunk_micro DESC, user_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {_EB_TOP}
    """,
)
def ab_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user conversion rates: a
    beta-binomial prior fit by method of moments (prior mean = the
    pooled rate; prior strength m0 = mu(1-mu)/var - 1 from the
    variance of the per-user micro rates, floored at 1), then every
    user's rate shrinks to (c + m0*mu)/(n + m0). The top-{_EB_TOP}
    SHRUNK leaderboard is the deliverable: the 1-for-1 user no
    longer outranks the 95-for-100 one, which is the entire point.
    Counts and raw rates are exact integers; the prior and shrunk
    rates are fixed-shape float formulas micro-rounded once.

    Scale: user-grain fold, one-row moment fold broadcast back, a
    partial top-k."""
    u = (
        io.load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("c"),
        )
        .withColumn(
            "raw_micro",
            F.expr("(2000000 * c + n) div (2 * n)"),
        )
    )
    m = u.agg(
        F.count("*").alias("k"),
        F.sum("c").alias("sc"),
        F.sum("n").alias("sn"),
        F.sum("raw_micro").alias("sr"),
        F.sum(
            F.col("raw_micro").cast("double") * F.col("raw_micro")
        ).alias("srr"),
    )
    prior = m.select(
        (F.col("sc").cast("double") / F.col("sn")).alias("mu"),
        F.greatest(
            (
                F.col("srr") / F.col("k")
                - (F.col("sr").cast("double") / F.col("k"))
                * (F.col("sr").cast("double") / F.col("k"))
            )
            / 1000000.0
            / 1000000.0,
            F.lit(0.0000001),
        ).alias("var_hat"),
    )
    strength = prior.select(
        "mu",
        F.greatest(
            F.col("mu") * (F.lit(1.0) - F.col("mu")) / F.col("var_hat")
            - 1.0,
            F.lit(1.0),
        ).alias("m0"),
    )
    scored = u.crossJoin(F.broadcast(strength)).withColumn(
        "shrunk_micro",
        F.floor(
            1000000.0
            * (F.col("c") + F.col("m0") * F.col("mu"))
            / (F.col("n") + F.col("m0"))
            + 0.5
        ).cast("long"),
    )
    wr = Window.orderBy(F.col("shrunk_micro").desc(), "user_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _EB_TOP)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            F.col("c").cast("long").alias("conversions"),
            F.col("raw_micro").cast("long").alias("raw_micro"),
            "shrunk_micro",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
