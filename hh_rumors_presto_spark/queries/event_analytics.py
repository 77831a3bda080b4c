"""Batch event-analytics operators over the events fixture: sessionization
(gaps-and-islands), funnel conversion, cohort retention — the standard
product-analytics trio, each a composition of keyed windows and hash
aggregates (one shuffle per stage, no driver loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

GAP_MIN = 30


@query(
    "ts_sessionize",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL {GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, CAST(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        FROM marked
    )
    SELECT user_id, session_no,
           min(ts) AS session_start,
           max(ts) AS session_last,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands: lag + gap flag + running
    sum = session number, then per-session aggregates. The batch twin of
    stream_session (same 30-minute gap).

    Gaps are compared at MICROSECOND precision (unix_micros) to match the
    oracle's µs-precision INTERVAL comparison exactly — a whole-second cast
    would split sessions differently for sub-second gaps straddling the
    30-minute boundary."""
    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marked = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_last"),
        F.count("*").alias("n_events"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH stages AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_view) AS n_viewed,
           count(CASE WHEN t_click > t_view THEN 1 END) AS n_clicked_after_view,
           count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
               AS n_full_funnel
    FROM stages
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): first-touch timestamp per
    stage via conditional min, then ordered-progression counts. One hash
    aggregate per user + one global rollup — no self-joins."""
    ev = io.load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(
            F.when(F.col("event_type") == kind, F.col("ts"))
        ).alias(f"t_{kind}")

    stages = ev.groupBy("user_id").agg(
        first_ts("view"), first_ts("click"), first_ts("purchase")
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "n_clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               date_diff('day', f.cohort_day,
                         CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) AS DATE)) AS day_offset,
               f.cohort_day
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, count(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted on
    each subsequent day-offset (first week). The firsts aggregate is small
    -> broadcast back onto the event stream."""
    ev = io.load_table(spark, sf_dir, "events")
    # cast to DATE: Spark's date_trunc returns timestamp, DuckDB's returns
    # DATE — align the grain explicitly
    day = F.date_trunc("day", F.col("ts")).cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.date_diff(day, F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
    )


@query(
    "agg_session_window",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL {GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        -- event_id tiebreak must match the `marked` window: without it a
        -- row sharing a timestamp with a session-boundary row can
        -- nondeterministically receive the pre-boundary session_no.
        SELECT *, sum(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {GAP_MIN} MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE batch session_window operator (vs ts_sessionize's
    gaps-and-islands formulation): one groupBy, engine-managed session
    merging — the same operator Structured Streaming uses for
    stream_session, here on a static frame.

    Boundary semantics differ from the islands form and the oracle
    mirrors them: a new session starts when the gap is >= {GAP_MIN} min
    (islands: strictly >), and session_end = last event + gap. The
    struct-typed window is projected to scalar start/end columns (the
    driver canonicalizer rejects struct cells)."""
    ev = io.load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{GAP_MIN} minutes").alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "agg_attribution",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, event_type,
               first_value(CASE WHEN event_type = 'click' THEN event_id END
                           IGNORE NULLS) OVER w AS first_click,
               last_value(CASE WHEN event_type = 'click' THEN event_id END
                          IGNORE NULLS) OVER w AS last_click
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id AS purchase_id, first_click, last_click
    FROM marked WHERE event_type = 'purchase'
    """,
)
def agg_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution: every purchase is credited to the user's
    FIRST preceding click (first-touch) and LATEST preceding click
    (last-touch) under the (ts, event_id) total order — the marketing
    analytics staple, done with two ignore-nulls window lookups over the
    strictly-preceding frame (so a click at the purchase's own position
    never self-attributes; purchases before any click yield NULLs).

    Scale: one keyed window, constant state (two carried ids) — no
    click⋈purchase range join, which is the naive quadratic form."""
    ev = io.load_events(spark, sf_dir)
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.first(click_id, ignorenulls=True).over(w).alias("first_click"),
        F.last(click_id, ignorenulls=True).over(w).alias("last_click"),
    )
    return marked.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "first_click",
        "last_click",
    )


_RL_COOLDOWN_US = 21_600_000_000  # 6-hour cooldown (fixture events
# average ~2.4/user/day, so a short cooldown would throttle almost nothing)


@query(
    "ts_rate_limit",
    oracle=f"""
    WITH RECURSIVE ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ),
    r AS (
        SELECT user_id, rn, us, event_id, us AS last_kept, TRUE AS kept
        FROM ev WHERE rn = 1
        UNION ALL
        SELECT e.user_id, e.rn, e.us, e.event_id,
               CASE WHEN e.us >= r.last_kept + {_RL_COOLDOWN_US}
                    THEN e.us ELSE r.last_kept END,
               e.us >= r.last_kept + {_RL_COOLDOWN_US}
        FROM r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, event_id FROM r WHERE kept
    """,
)
def ts_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cooldown rate limiting (alerting/notification throttle): keep an
    event only if at least 6 hours passed since the LAST KEPT event of
    that user. Genuinely recursive per-key state — the survivor set
    depends on earlier survivors, so no window/sessionize rewrite exists
    (a session gap measures from the last EVENT, not the last KEPT one).
    The Spark side is the sanctioned custom-stateful-operator shape: an
    Arrow-batched linear scan per user via applyInPandas; the oracle is
    the same recursion as a recursive CTE.

    Scale: one shuffle on the group key, O(group) memory in the worker,
    identical cost shape to a hash aggregate plus the Arrow hop — the
    batch twin of applyInPandasWithState (stream_stateful)."""
    import pandas as pd

    ev = io.load_events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )

    def keep_throttled(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        kept_rows = []
        last_kept = None
        for row in pdf.itertuples(index=False):
            if last_kept is None or row.us >= last_kept + _RL_COOLDOWN_US:
                kept_rows.append((row.user_id, row.event_id))
                last_kept = row.us
        return pd.DataFrame(kept_rows, columns=["user_id", "event_id"])

    return ev.groupBy("user_id").applyInPandas(
        keep_throttled, "user_id long, event_id long"
    )
