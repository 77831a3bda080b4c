"""Statistical aggregates and time-series operators.

The correlation/covariance/stddev family is order-dependent when computed
with streaming float accumulators (engines differ), so the implementation
computes EXACT decimal moments (sum x, sum y, sum x², sum y², sum xy) and
derives the statistics with plain double arithmetic — identical IEEE ops in
both engines, bit-exact results, and the moment aggregation is a single
map-side-combinable hash agg (the same shape the built-in corr uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query


@query(
    "agg_corr",
    oracle="""
    WITH d AS (
        SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(18,2)) AS qd,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS pd
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(sum(qd) AS DOUBLE) AS sx,
               CAST(sum(pd) AS DOUBLE) AS sy,
               CAST(sum(qd * qd) AS DOUBLE) AS sxx,
               CAST(sum(pd * pd) AS DOUBLE) AS syy,
               CAST(sum(qd * pd) AS DOUBLE) AS sxy
        FROM d
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / nullif(n - 1, 0) AS covar_samp,
           sqrt((sxx - sx * sx / n) / nullif(n - 1, 0)) AS stddev_qty,
           (sxy - sx * sy / n)
             / nullif(sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n), 0.0)
               AS corr_qty_price
    FROM m
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / stddev via exact decimal moments (see module
    docstring): order-insensitive, bit-exact across engines — unlike the
    built-in streaming accumulators."""
    li = io.load_table(spark, sf_dir, "lineitem")
    # Cast the BASE columns to decimal (unambiguous 2-dec values) and
    # multiply in exact decimal — casting the double PRODUCT to decimal is
    # not cross-engine-stable at ~1e10 magnitudes, where the rounding
    # boundary sits below the double's own precision.
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # nullif guards: single-row groups (n-1 = 0) and zero-variance columns
    # yield NULL, matching the oracle, instead of ANSI DIVIDE_BY_ZERO
    return m.select(
        "l_returnflag",
        "n",
        ((sxy - sx * sy / n) / F.nullif(n - 1, F.lit(0))).alias("covar_samp"),
        F.sqrt((sxx - sx * sx / n) / F.nullif(n - 1, F.lit(0))).alias("stddev_qty"),
        (
            (sxy - sx * sy / n)
            / F.nullif(
                F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n),
                F.lit(0.0),
            )
        ).alias("corr_qty_price"),
    )


N_BUCKETS = 10


@query(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(least(floor(o_totalprice / 50000), {N_BUCKETS - 1}) AS BIGINT) AS bucket,
           count(*) AS n,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(x/w) clamped to the last
    bucket — one hash agg, the building block for distribution profiling
    at scale (no sort, no sketch needed for fixed buckets)."""
    orders = io.load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000), F.lit(N_BUCKETS - 1)
    ).cast("long")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "ts_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS d0,
               date_trunc('day', max(CAST(ts AS TIMESTAMP))) AS d1
        FROM events
        WHERE user_id < 10
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    ),
    observed AS (
        SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               count(*) AS n_events
        FROM events
        WHERE user_id < 10
        GROUP BY 1, 2
    )
    SELECT g.user_id, g.day, coalesce(o.n_events, 0) AS n_events,
           last_value(o.n_events IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_seen_events
    FROM grid g LEFT JOIN observed o
      ON o.user_id = g.user_id AND o.day = g.day
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: build the dense per-user day grid
    (sequence+explode), left-join observed daily counts, zero-fill and
    LOCF-carry. The grid generation is pure column ops — no driver loop —
    so it scales with users × days across partitions."""
    ev = io.load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    day = F.date_trunc("day", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    observed = ev.groupBy("user_id", day.alias("day")).agg(
        F.count("*").alias("n_events")
    )
    from pyspark.sql import Window

    joined = grid.join(observed, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last("n_events", ignorenulls=True).over(w).alias("last_seen_events"),
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark's percentile() and DuckDB's
    quantile_cont use the same linear interpolation and match bit-for-bit
    (verified). The exact form needs a per-group sort; agg_approx_quantile
    is the sketch-based 100 TB alternative."""
    li = io.load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
        F.count("*").alias("n"),
    )
