"""Round-63 breadth batch: seasonal strength, the arena win matrix,
and the price-endings audit.

- ``ts_seasonal_strength`` — Hyndman's seasonal-strength measure
  F_s = max(0, 1 - Var(residual)/Var(seasonal+residual)) over the
  weekday decomposition: the 0-to-1 answer to "does this series
  actually have a weekly shape", from exact n-scaled integer
  variances with one division — the scalar gate in front of any
  seasonal model.
- ``eval_win_matrix`` — the pairwise win-rate matrix behind every
  arena leaderboard: per model pair, wins each way and the win rate
  in exact micro units — eval_bradley_terry compresses this into
  ratings; reviewers read the matrix to find non-transitive cycles
  the ratings hide.
- ``agg_price_endings`` — the .99 audit: the distribution of price
  cent-endings, top endings ranked — charm-pricing conventions
  (and their absence) are a data-provenance fingerprint: a supplier
  whose endings go uniform switched from human pricing to a
  generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# ts_seasonal_strength
# --------------------------------------------------------------------------


@query(
    "ts_seasonal_strength",
    oracle="""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-05',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS ed,
               sum(CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                        AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    ),
    eff AS (
        SELECT d.ed % 7 AS dow, d.cents,
               avg_all.mu_n, avg_all.n_all
        FROM daily d
        CROSS JOIN (SELECT sum(cents) AS mu_n, count(*) AS n_all
                    FROM daily) avg_all
    ),
    dow_eff AS (
        SELECT dow, sum(cents) AS s, count(*) AS n
        FROM eff GROUP BY dow
    ),
    detr AS (
        SELECT (e.cents * de.n - de.s) AS resid_n,
               de.n, e.n_all, e.mu_n, e.cents
        FROM eff e JOIN dow_eff de ON de.dow = e.dow
    ),
    moments AS (
        SELECT sum(CAST(resid_n AS DOUBLE) * resid_n
                   / (CAST(n AS DOUBLE) * n)) AS var_resid_raw,
               sum((CAST(cents AS DOUBLE) - CAST(mu_n AS DOUBLE)
                    / n_all)
                   * (CAST(cents AS DOUBLE) - CAST(mu_n AS DOUBLE)
                      / n_all)) AS var_total_raw,
               count(*) AS n
        FROM detr
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(var_resid_raw / n, 4) AS var_resid,
           round(var_total_raw / n, 4) AS var_detrended,
           round(greatest(
               1.0 - var_resid_raw / var_total_raw, 0.0), 6)
               AS seasonal_strength
    FROM moments
    """,
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyndman's seasonal strength on the daily purchase-cents
    series with a weekday decomposition: residual = day value minus
    its weekday mean (computed as the n-scaled integer cents*n - S
    so the squared residual sum is exact until one final division),
    total = day value minus the grand mean, F_s = max(0, 1 -
    Var(resid)/Var(total)). F_s near 0 says the weekday shape
    explains nothing and a seasonal model is superstition; near 1
    says the week IS the series — the scalar that decides between
    ts_seasonal_decompose and a plain trend model.

    Scale: daily collapse, a 7-row weekday-mean broadcast, one
    moment fold. Variance ratios are shape-pinned float expressions
    over exact integer numerators."""
    daily = (
        io.load_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05")
            ).alias("ed")
        )
        .agg(
            F.sum(
                F.floor(F.col("value").cast("double") * 100.0 + 0.5)
                .cast("long")
            ).alias("cents")
        )
    )
    tot = daily.agg(
        F.sum("cents").alias("mu_n"), F.count("*").alias("n_all")
    )
    eff = daily.crossJoin(F.broadcast(tot)).select(
        (F.col("ed") % 7).alias("dow"), "cents", "mu_n", "n_all"
    )
    dow_eff = eff.groupBy("dow").agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    detr = eff.join(F.broadcast(dow_eff), "dow").select(
        (F.col("cents") * F.col("n") - F.col("s")).alias("resid_n"),
        "n",
        "n_all",
        "mu_n",
        "cents",
    )
    moments = detr.agg(
        F.sum(
            F.col("resid_n").cast("double")
            * F.col("resid_n")
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("var_resid_raw"),
        F.sum(
            (
                F.col("cents").cast("double")
                - F.col("mu_n").cast("double") / F.col("n_all")
            )
            * (
                F.col("cents").cast("double")
                - F.col("mu_n").cast("double") / F.col("n_all")
            )
        ).alias("var_total_raw"),
        F.count("*").alias("n"),
    )
    return moments.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("var_resid_raw") / F.col("n"), 4).alias(
            "var_resid"
        ),
        F.round(F.col("var_total_raw") / F.col("n"), 4).alias(
            "var_detrended"
        ),
        F.round(
            F.greatest(
                F.lit(1.0)
                - F.col("var_resid_raw") / F.col("var_total_raw"),
                F.lit(0.0),
            ),
            6,
        ).alias("seasonal_strength"),
    )


# --------------------------------------------------------------------------
# eval_win_matrix
# --------------------------------------------------------------------------


@query(
    "eval_win_matrix",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, event_type,
               CAST(ts AS TIMESTAMP) AS ts,
               CAST(floor(CAST(value AS DOUBLE) * 100.0 + 0.5)
                    AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    seq AS (
        SELECT user_id, event_type, cents,
               lag(event_type) OVER w AS prev_type,
               lag(cents) OVER w AS prev_cents
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    matches AS (
        SELECT CASE WHEN cents > prev_cents THEN event_type
                    WHEN cents < prev_cents THEN prev_type
                    ELSE least(event_type, prev_type) END AS winner,
               CASE WHEN cents > prev_cents THEN prev_type
                    WHEN cents < prev_cents THEN event_type
                    ELSE greatest(event_type, prev_type) END AS loser
        FROM seq
        WHERE prev_type IS NOT NULL AND event_type <> prev_type
    ),
    cells AS (
        SELECT least(winner, loser) AS a,
               greatest(winner, loser) AS b,
               sum(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                   AS wins_a,
               sum(CASE WHEN winner > loser THEN 1 ELSE 0 END)
                   AS wins_b
        FROM matches GROUP BY 1, 2
    )
    SELECT a AS model_a, b AS model_b,
           CAST(wins_a AS BIGINT) AS wins_a,
           CAST(wins_b AS BIGINT) AS wins_b,
           CAST((2000000 * wins_a + wins_a + wins_b)
               // (2 * (wins_a + wins_b)) AS BIGINT) AS winrate_a_micro
    FROM cells
    """,
)
def eval_win_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairwise win-rate matrix over eval_bradley_terry's match
    stream (consecutive same-user events, higher value wins,
    deterministic tie-breaks): per unordered model pair, wins each
    way and A's win rate in half-up micro units. Ratings compress
    this matrix into one number per model and LOSE the
    non-transitive cycles (A beats B beats C beats A) that tell you
    the models are good at DIFFERENT things — reviewers read the
    matrix before trusting the leaderboard.

    Scale: one keyed lag pass to matches, a |models|²-cell fold —
    nothing scales with the fact after the first window."""
    ev = (
        io.load_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.floor(F.col("value").cast("double") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "cents",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("cents").over(w).alias("prev_cents"),
    ).filter(
        F.col("prev_type").isNotNull()
        & (F.col("event_type") != F.col("prev_type"))
    )
    matches = seq.select(
        F.when(F.col("cents") > F.col("prev_cents"), F.col("event_type"))
        .when(F.col("cents") < F.col("prev_cents"), F.col("prev_type"))
        .otherwise(F.least("event_type", "prev_type"))
        .alias("winner"),
        F.when(F.col("cents") > F.col("prev_cents"), F.col("prev_type"))
        .when(F.col("cents") < F.col("prev_cents"), F.col("event_type"))
        .otherwise(F.greatest("event_type", "prev_type"))
        .alias("loser"),
    )
    cells = matches.groupBy(
        F.least("winner", "loser").alias("model_a"),
        F.greatest("winner", "loser").alias("model_b"),
    ).agg(
        F.sum(
            F.when(F.col("winner") < F.col("loser"), 1).otherwise(0)
        ).alias("wins_a"),
        F.sum(
            F.when(F.col("winner") > F.col("loser"), 1).otherwise(0)
        ).alias("wins_b"),
    )
    return cells.select(
        "model_a",
        "model_b",
        F.col("wins_a").cast("long").alias("wins_a"),
        F.col("wins_b").cast("long").alias("wins_b"),
        F.expr(
            "(2000000 * wins_a + wins_a + wins_b)"
            " div (2 * (wins_a + wins_b))"
        ).alias("winrate_a_micro"),
    )


# --------------------------------------------------------------------------
# agg_price_endings
# --------------------------------------------------------------------------

_PE_TOP = 10


@query(
    "agg_price_endings",
    oracle=f"""
    WITH endings AS (
        SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   % 100 AS ending,
               count(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT CAST(ending AS BIGINT) AS cent_ending,
           CAST(n AS BIGINT) AS n,
           CAST((2000000 * n + total) // (2 * total) AS BIGINT)
               AS share_micro,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT ending, n, sum(n) OVER () AS total,
               row_number() OVER (ORDER BY n DESC, ending) AS rnk
        FROM endings
    ) WHERE rnk <= {_PE_TOP}
    """,
)
def agg_price_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The price-endings audit: the distribution of cent endings
    (price mod $1) with the top {_PE_TOP} ranked and their exact
    micro shares. Human-priced catalogs pile on .99/.95/.00 (charm
    pricing); machine-generated or FX-converted prices spread
    uniformly — so the SHAPE of this histogram fingerprints where
    prices come from, and a shift between snapshots means the
    pricing pipeline changed even when totals didn't. Exact counts,
    integral shares.

    Scale: one fact pass to a <=100-row ending histogram; the rank
    runs over those rows."""
    endings = (
        io.load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                .cast("long")
                % 100
            ).alias("cent_ending")
        )
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy()
    wr = Window.orderBy(F.col("n").desc(), "cent_ending")
    return (
        endings.withColumn("total", F.sum("n").over(wt))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _PE_TOP)
        .select(
            "cent_ending",
            F.col("n").cast("long").alias("n"),
            F.expr(
                "(2000000 * n + total) div (2 * total)"
            ).alias("share_micro"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
