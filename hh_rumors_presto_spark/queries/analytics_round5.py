"""Round-5 analytics batch: seasonal decomposition, ML feature
engineering, a feature-store point-in-time composite, and Holt-Winters
smoothing.

- ``ts_seasonal_decompose`` — classical additive decomposition
  (trend = centered moving average, seasonal = hour-of-day mean of the
  detrended series, residual = remainder) per event_type. All partials are
  INTEGER sums (the trend numerator is a 25-hour count sum; the seasonal
  numerator is a BIGINT combination), so every double in the output is
  derived from exact integers — no reduction-order drift between engines.
- ``feat_target_encode`` — leave-one-out smoothed target encoding
  (the classic high-cardinality categorical feature): per-category sums
  broadcast back over the fact rows, global prior as a one-row broadcast.
- ``join_pit_multi`` — point-in-time-correct multi-table feature join (the
  feature-store serving shape): one spine, two feature tables, each joined
  as-of the spine timestamp with no leakage from the future. Reuses the
  equi-join + max_by as-of operator (one shuffle per feature table, no
  window over the join fan-out).
- ``ts_holt_winters`` — double exponential smoothing (level + trend),
  alpha = beta = 1/2. A COUPLED two-state recursion no window can express:
  implemented as an Arrow-batched applyInPandas per key (O(1) state per
  series, partitioned by key — the custom stateful operator path), and
  oracle-checked against a DuckDB recursive CTE running the identical
  IEEE-754 steps, so the match is bit-exact, not approximate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.operators.asof import asof_join
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# ts_seasonal_decompose
# --------------------------------------------------------------------------

_SD_HALF = 12  # centered moving average half-width (25-hour window)


@query(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH e AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
        FROM events
    ),
    bounds AS (
        SELECT min(bucket) AS tmin, max(bucket) AS tmax FROM e
    ),
    grid AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM e) t,
             (SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR))
                  AS bucket FROM bounds) g
    ),
    counts AS (
        SELECT event_type, bucket, count(*) AS n FROM e GROUP BY 1, 2
    ),
    series AS (
        SELECT g.event_type, g.bucket, coalesce(c.n, 0) AS n
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.bucket = g.bucket
    ),
    windowed AS (
        SELECT event_type, bucket, n,
               sum(n) OVER w AS trend_num,
               count(*) OVER w AS wcnt
        FROM series
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN {_SD_HALF} PRECEDING AND {_SD_HALF} FOLLOWING)
    ),
    trended AS (
        SELECT event_type, bucket, n,
               CASE WHEN wcnt = {2 * _SD_HALF + 1} THEN trend_num END AS trend_num
        FROM windowed
    ),
    seasonal AS (
        SELECT event_type, extract(hour FROM bucket) AS hod,
               sum({2 * _SD_HALF + 1} * n - trend_num) AS s_num,
               count(trend_num) AS s_cnt
        FROM trended
        WHERE trend_num IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT t.event_type, t.bucket, CAST(t.n AS BIGINT) AS n,
           round(CAST(t.trend_num AS DOUBLE) / {2 * _SD_HALF + 1}, 6) AS trend,
           round(CAST(s.s_num AS DOUBLE) / ({2 * _SD_HALF + 1} * s.s_cnt), 6)
               AS seasonal,
           round(t.n - CAST(t.trend_num AS DOUBLE) / {2 * _SD_HALF + 1}
                 - CAST(s.s_num AS DOUBLE) / ({2 * _SD_HALF + 1} * s.s_cnt), 6)
               + 0.0 AS resid
    FROM trended t
    JOIN seasonal s
      ON s.event_type = t.event_type AND s.hod = extract(hour FROM t.bucket)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition of the hourly event-count
    series per event_type: trend = centered 25-hour moving average (only
    where the window is full), seasonal = hour-of-day mean of the
    detrended series, resid = n - trend - seasonal.

    Shape at scale: the series is DENSIFIED onto an explicit hour grid
    (sequence + explode — the gap-fill step that makes row-windows mean
    time-windows), then everything is keyed: the moving average is a
    per-event_type ROWS window, the seasonal profile is a (type, hour)
    aggregation whose result (|keys| x 24 rows) broadcasts back. All
    partials are integer sums, so no floating reduction-order drift;
    doubles appear only in the final per-row projection.
    """
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    bounds = ev.agg(
        F.min("bucket").alias("tmin"), F.max("bucket").alias("tmax")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("tmin", "tmax", F.expr("interval 1 hour"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    counts = ev.groupBy("event_type", "bucket").agg(F.count("*").alias("n"))
    series = grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("n", F.lit(0)).alias("n")
    )
    full = 2 * _SD_HALF + 1
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-_SD_HALF, _SD_HALF)
    )
    trended = series.select(
        "event_type",
        "bucket",
        "n",
        F.when(F.count("*").over(w) == full, F.sum("n").over(w)).alias(
            "trend_num"
        ),
    )
    seasonal = (
        trended.filter(F.col("trend_num").isNotNull())
        .groupBy(
            F.col("event_type").alias("s_type"),
            F.hour("bucket").alias("hod"),
        )
        .agg(
            F.sum(full * F.col("n") - F.col("trend_num")).alias("s_num"),
            F.count("trend_num").alias("s_cnt"),
        )
    )
    trend = F.col("trend_num").cast("double") / full
    seas = F.col("s_num").cast("double") / (full * F.col("s_cnt"))
    return (
        trended.join(
            F.broadcast(seasonal),
            (F.col("event_type") == F.col("s_type"))
            & (F.hour(F.col("bucket")) == F.col("hod")),
        )
        .select(
            "event_type",
            "bucket",
            F.col("n").cast("bigint").alias("n"),
            F.round(trend, 6).alias("trend"),
            F.round(seas, 6).alias("seasonal"),
            (F.round(F.col("n") - trend - seas, 6) + F.lit(0.0)).alias("resid"),
        )
    )


# --------------------------------------------------------------------------
# feat_target_encode
# --------------------------------------------------------------------------

_TE_SMOOTH = 10  # pseudo-count weight of the global prior


@query(
    "feat_target_encode",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority AS category,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    cat AS (
        SELECT category, sum(y) AS cat_sum, count(*) AS cat_cnt
        FROM base GROUP BY category
    ),
    g AS (SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM base)
    SELECT b.o_orderkey, b.category,
           round((c.cat_sum - b.y + {_TE_SMOOTH} * g.prior)
                 / (c.cat_cnt - 1 + {_TE_SMOOTH}), 6) AS target_enc
    FROM base b JOIN cat c ON c.category = b.category, g
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target encoding of a categorical column
    (order priority vs the binary 'fulfilled' target): enc_i =
    (cat_sum - y_i + m * prior) / (cat_cnt - 1 + m). The classic
    high-cardinality feature transform for tabular ML.

    Shape at scale: per-category sums are a keyed aggregate whose result
    (|categories| rows) broadcasts back over the fact scan; the global
    prior is a ONE-ROW broadcast (the sanctioned scalar cross join). The
    fact table is scanned once and never shuffled. All sums are integer,
    so the encoding is bit-deterministic.
    """
    base = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cat = base.groupBy("category").agg(
        F.sum("y").alias("cat_sum"), F.count("*").alias("cat_cnt")
    )
    g = base.agg(
        (F.sum("y").cast("double") / F.count("*")).alias("prior")
    )
    enc = (
        F.col("cat_sum") - F.col("y") + _TE_SMOOTH * F.col("prior")
    ) / (F.col("cat_cnt") - 1 + _TE_SMOOTH)
    return (
        base.join(F.broadcast(cat), "category")
        .crossJoin(F.broadcast(g))
        .select("o_orderkey", "category", F.round(enc, 6).alias("target_enc"))
    )


# --------------------------------------------------------------------------
# join_pit_multi
# --------------------------------------------------------------------------


@query(
    "join_pit_multi",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    spine AS (
        SELECT event_id AS spine_id, user_id, ts
        FROM e WHERE event_type = 'purchase'
    ),
    feat_a AS (
        SELECT s.spine_id, a.event_id, a.value,
               row_number() OVER (
                   PARTITION BY s.spine_id ORDER BY a.ts DESC, a.event_id DESC
               ) AS rn
        FROM spine s JOIN e a
          ON a.user_id = s.user_id AND a.event_type = 'click'
         AND a.ts <= s.ts
    ),
    feat_b AS (
        SELECT s.spine_id, b.event_id, b.value,
               row_number() OVER (
                   PARTITION BY s.spine_id ORDER BY b.ts DESC, b.event_id DESC
               ) AS rn
        FROM spine s JOIN e b
          ON b.user_id = s.user_id AND b.event_type = 'view'
         AND b.ts <= s.ts
    )
    SELECT s.spine_id, s.user_id,
           a.event_id AS click_event_id, a.value AS click_value,
           b.event_id AS view_event_id, b.value AS view_value
    FROM spine s
    LEFT JOIN (SELECT * FROM feat_a WHERE rn = 1) a ON a.spine_id = s.spine_id
    LEFT JOIN (SELECT * FROM feat_b WHERE rn = 1) b ON b.spine_id = s.spine_id
    """,
)
def join_pit_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct multi-table feature join (the feature-store
    serving/backfill shape): for every purchase (the spine), attach the
    latest click-stream feature AND the latest view-stream feature
    observed at-or-before the purchase timestamp — never after (no
    leakage). Left-outer per feature table: spines with no history keep
    NULL features.

    Shape at scale: each feature table is one MERGE-AS-OF
    (operators/asof.py, r11): tagged union + one keyed shuffle of
    spine+feature thin rows + running last(ignorenulls) window — no join
    fan-out ever materializes; features resolved independently then
    stitched on the unique spine id."""
    ev = io.load_table(spark, sf_dir, "events")
    spine = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("spine_id"), "user_id", "ts"
    )
    # re-read the table for the feature sides: distinct scan lineage keeps
    # the three-way self-join free of ambiguous-attribute resolution (the
    # scans are identical, so Catalyst still reuses the exchange)
    ev_feat = io.load_table(spark, sf_dir, "events")
    feat_a = ev_feat.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
        F.col("ts").alias("a_ts"),
    )
    feat_b = io.load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    ).select(
        "user_id",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
        F.col("ts").alias("b_ts"),
    )
    with_a = asof_join(
        spine,
        feat_a,
        key="user_id",
        left_ts="ts",
        right_ts="a_ts",
        payload_cols=["click_event_id", "click_value"],
        right_tiebreak="click_event_id",
    )
    with_ab = asof_join(
        with_a,
        feat_b,
        key="user_id",
        left_ts="ts",
        right_ts="b_ts",
        payload_cols=["view_event_id", "view_value"],
        right_tiebreak="view_event_id",
    )
    return with_ab.select(
        "spine_id",
        "user_id",
        "click_event_id",
        "click_value",
        "view_event_id",
        "view_value",
    )


# --------------------------------------------------------------------------
# ts_holt_winters
# --------------------------------------------------------------------------


@query(
    "ts_holt_winters",
    oracle="""
    WITH RECURSIVE s AS (
        SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS rn
        FROM events WHERE value IS NOT NULL
    ),
    hw AS (
        SELECT user_id, event_id, rn, value,
               value AS level, CAST(0.0 AS DOUBLE) AS trend
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn, s.value,
               0.5 * s.value + 0.5 * (hw.level + hw.trend) AS level,
               0.5 * ((0.5 * s.value + 0.5 * (hw.level + hw.trend))
                      - hw.level)
                 + 0.5 * hw.trend AS trend
        FROM hw JOIN s ON s.user_id = hw.user_id AND s.rn = hw.rn + 1
    )
    SELECT user_id, event_id, level, trend FROM hw
    """,
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend, alpha = beta =
    1/2) per user series — a COUPLED two-state recursion (each step needs
    both previous states) that no window frame or lag-unroll can express.

    Shape at scale: applyInPandas partitioned by the series key — Arrow
    batches in, a single O(1)-state sequential pass per series, Arrow
    out. State never leaves the executor, series never co-reside, and
    1000 executors process 1000 key groups concurrently; this is the
    sanctioned custom-stateful-operator escape hatch (SURVEY §4.2).
    Determinism: the per-row order is the (ts, event_id) total order,
    alpha/beta are exact binary fractions, and the Python loop performs
    the SAME IEEE-754 double ops as the oracle's recursive CTE — the
    match is bit-exact (passes VERIFY_EXACT_FLOATS), not approximate.
    """
    ev = (
        io.load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        values = [float(v) for v in pdf["value"]]
        levels: list[float] = []
        trends: list[float] = []
        level = 0.0
        trend = 0.0
        for i, y in enumerate(values):
            if i == 0:
                level, trend = y, 0.0
            else:
                prev = level
                level = 0.5 * y + 0.5 * (level + trend)
                trend = 0.5 * (level - prev) + 0.5 * trend
            levels.append(level)
            trends.append(trend)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "level": levels,
                "trend": trends,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        smooth, "user_id long, event_id long, level double, trend double"
    )


# --------------------------------------------------------------------------
# dim_calendar_join
# --------------------------------------------------------------------------


@query(
    "dim_calendar_join",
    oracle="""
    WITH bounds AS (
        SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax FROM orders
    ),
    cal AS (
        SELECT unnest(generate_series(dmin, dmax, INTERVAL 1 DAY))::DATE AS d
        FROM bounds
    ),
    daily AS (
        SELECT o_orderdate AS d, count(*) AS n_orders FROM orders GROUP BY 1
    )
    SELECT cal.d AS cal_date,
           CAST(isodow(cal.d) AS INT) AS iso_dow,
           CAST(month(cal.d) AS INT) AS month,
           CAST(quarter(cal.d) AS INT) AS quarter,
           (isodow(cal.d) >= 6) AS is_weekend,
           CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders
    FROM cal LEFT JOIN daily ON daily.d = cal.d
    """,
)
def dim_calendar_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation + conformed join: a dense date spine
    from the fact table's own bounds, decorated with ISO weekday /
    month / quarter / weekend attributes, left-joined to daily order
    counts with zero-fill — the standard warehouse pattern that makes
    day-over-day reports gap-free (a missing sales day must appear as 0,
    not vanish). ISO weekday is derived from Spark's Sunday-based
    dayofweek via ((dow + 5) % 7) + 1 so both engines agree exactly.

    Shape at scale: the spine generates from a ONE-ROW bounds aggregate
    (sequence + explode — rows proportional to days, not facts); daily
    counts are one keyed aggregate; the join is spine-sized."""
    orders = io.load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("dmin"), F.max("o_orderdate").alias("dmax")
    )
    cal = bounds.select(
        F.explode(
            F.sequence("dmin", "dmax", F.expr("interval 1 day"))
        ).alias("cal_date")
    )
    daily = orders.groupBy(F.col("o_orderdate").alias("cal_date")).agg(
        F.count("*").alias("n_orders")
    )
    iso_dow = ((F.dayofweek("cal_date") + 5) % 7 + 1).cast("int")
    # sequence over a day-time interval yields timestamps; the dimension
    # key is a DATE
    cal = cal.select(F.col("cal_date").cast("date").alias("cal_date"))
    return (
        cal.join(daily, "cal_date", "left")
        .select(
            "cal_date",
            iso_dow.alias("iso_dow"),
            F.month("cal_date").cast("int").alias("month"),
            F.quarter("cal_date").cast("int").alias("quarter"),
            (iso_dow >= 6).alias("is_weekend"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# ts_forecast_backtest
# --------------------------------------------------------------------------

_FB_SEASON = 24  # seasonal-naive lag, hours
_FB_HOLDOUT = 48  # backtest window, hours


@query(
    "ts_forecast_backtest",
    oracle=f"""
    WITH e AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
        FROM events
    ),
    bounds AS (SELECT min(bucket) AS tmin, max(bucket) AS tmax FROM e),
    grid AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM e) t,
             (SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR))
                  AS bucket FROM bounds) g
    ),
    counts AS (
        SELECT event_type, bucket, count(*) AS n FROM e GROUP BY 1, 2
    ),
    series AS (
        SELECT g.event_type, g.bucket, coalesce(c.n, 0) AS n,
               row_number() OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket
               ) AS idx,
               count(*) OVER (PARTITION BY g.event_type) AS n_hours
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.bucket = g.bucket
    ),
    scored AS (
        SELECT event_type, bucket, n,
               lag(n, {_FB_SEASON}) OVER (
                   PARTITION BY event_type ORDER BY bucket
               ) AS forecast
        FROM series
        WHERE idx > n_hours - {_FB_HOLDOUT + _FB_SEASON}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(abs(n - forecast)) AS BIGINT) AS abs_err_total,
           round(CAST(sum(abs(n - forecast)) AS DOUBLE) / count(*), 6)
               AS mae,
           round(CAST(sum(abs(n - forecast)) AS DOUBLE)
                 / nullif(sum(n), 0), 6) AS wape
    FROM scored
    WHERE forecast IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each of the last 48
    hours as "same hour yesterday" (lag 24 on the densified hourly
    series) and score MAE and WAPE per event_type — the baseline every
    fancier forecaster must beat, with the honest backtest protocol
    (holdout at the end of the series, forecast never sees its target).

    Shape at scale: densified grid (as ts_seasonal_decompose), keyed lag
    window over |keys| x 72 tail rows only (the WHERE prunes the series
    before the window), integer counts so the error sums are exact."""
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    )
    bounds = ev.agg(
        F.min("bucket").alias("tmin"), F.max("bucket").alias("tmax")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("tmin", "tmax", F.expr("interval 1 hour"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    counts = ev.groupBy("event_type", "bucket").agg(F.count("*").alias("n"))
    w_idx = Window.partitionBy("event_type").orderBy("bucket")
    w_all = Window.partitionBy("event_type")
    series = (
        grid.join(counts, ["event_type", "bucket"], "left")
        .select(
            "event_type", "bucket", F.coalesce("n", F.lit(0)).alias("n")
        )
        .withColumn("idx", F.row_number().over(w_idx))
        .withColumn("n_hours", F.count("*").over(w_all))
        .filter(F.col("idx") > F.col("n_hours") - (_FB_HOLDOUT + _FB_SEASON))
    )
    scored = series.withColumn(
        "forecast", F.lag("n", _FB_SEASON).over(w_idx)
    ).filter(F.col("forecast").isNotNull())
    abs_err = F.abs(F.col("n") - F.col("forecast"))
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum(abs_err).cast("bigint").alias("abs_err_total"),
        F.round(F.sum(abs_err).cast("double") / F.count("*"), 6).alias("mae"),
        F.round(
            F.sum(abs_err).cast("double")
            / F.nullif(F.sum("n").cast("double"), F.lit(0.0)),
            6,
        ).alias("wape"),
    )
