"""Round-62 breadth batch: early-stopping replay, reciprocal-rank
fusion, and the backlog burndown curve.

- ``pipeline_early_stopping`` — the training-ops checkpoint
  selector: replay a daily error-rate curve with patience-3 early
  stopping (stop after three non-improving days, keep the argmin
  seen so far) — the policy every training loop applies, here as a
  deterministic window replay so checkpoint selection is auditable
  after the fact.
- ``sim_rank_fusion`` — Reciprocal Rank Fusion (Cormack et al.):
  two rankings fused by Σ 1/(k + rank) with k=60 — the standard
  hybrid-search combiner (BM25 list + vector list) that needs no
  score calibration at all, only ranks; exact micro reciprocals.
- ``agg_backlog_curve`` — the order-vs-ship burndown: cumulative
  lines ordered minus cumulative lines shipped per day, peak
  flagged — the operations chart that shows whether fulfillment
  keeps up with demand or the queue compounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# pipeline_early_stopping
# --------------------------------------------------------------------------

_ES_PATIENCE = 3


@query(
    "pipeline_early_stopping",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               (2000000 * sum(CASE WHEN event_type = 'error'
                              THEN 1 ELSE 0 END) + count(*))
                   // (2 * count(*)) AS loss_micro
        FROM events GROUP BY 1
    ),
    path AS (
        SELECT day, loss_micro,
               row_number() OVER (ORDER BY day) AS t,
               min(loss_micro) OVER (ORDER BY day) AS best,
               min(loss_micro) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND {_ES_PATIENCE} PRECEDING)
                   AS best_before_window
        FROM daily
    ),
    stops AS (
        SELECT t AS stop_t, day AS stop_day,
               row_number() OVER (ORDER BY day) AS rn
        FROM path
        WHERE t > {_ES_PATIENCE} AND best >= best_before_window
    ),
    stop1 AS (SELECT * FROM stops WHERE rn = 1),
    chosen AS (
        SELECT p.day AS best_day, p.loss_micro AS best_loss,
               row_number() OVER (ORDER BY p.loss_micro, p.day) AS rn
        FROM path p LEFT JOIN stop1 s ON TRUE
        WHERE s.stop_t IS NULL OR p.t <= s.stop_t
    )
    SELECT c.best_day, CAST(c.best_loss AS BIGINT) AS best_loss_micro,
           s.stop_day,
           CAST(coalesce(s.stop_t, (SELECT max(t) FROM path))
                AS BIGINT) AS epochs_run
    FROM (SELECT * FROM chosen WHERE rn = 1) c
    LEFT JOIN stop1 s ON TRUE
    """,
)
def pipeline_early_stopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-stopping replay over the daily error-rate curve
    (errors/events in exact micro units — the loss stand-in):
    training "stops" at the first day where the running best has not
    improved in the last {_ES_PATIENCE} days (best == best as of
    {_ES_PATIENCE} days ago), and the SELECTED checkpoint is the
    argmin up to the stop (loss ASC, day ASC tiebreak). Replaying
    the policy as a query makes checkpoint selection auditable: the
    chosen day and the epochs consumed are facts derived from the
    curve, not from whatever the training loop happened to log.

    Scale: daily collapse, two running-min windows over the
    calendar series (per run key at fleet scale), one-row folds."""
    ev = io.load_events(spark, sf_dir)
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.expr(
            "(2000000 * sum(CASE WHEN event_type = 'error'"
            " THEN 1 ELSE 0 END) + count(*)) div (2 * count(*))"
        ).alias("loss_micro")
    )
    wo = Window.orderBy("day")
    path = daily.select(
        "day",
        "loss_micro",
        F.row_number().over(wo).alias("t"),
        F.min("loss_micro").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("best"),
        F.min("loss_micro").over(
            wo.rowsBetween(
                Window.unboundedPreceding, -_ES_PATIENCE
            )
        ).alias("best_before_window"),
    ).localCheckpoint()
    stop1 = (
        path.filter(
            (F.col("t") > _ES_PATIENCE)
            & (F.col("best") >= F.col("best_before_window"))
        )
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select(
            F.col("t").alias("stop_t"),
            F.col("day").alias("stop_day"),
        )
    )
    max_t = path.agg(F.max("t").alias("mt"))
    eligible = path.join(F.broadcast(stop1), F.lit(True), "left").filter(
        F.col("stop_t").isNull() | (F.col("t") <= F.col("stop_t"))
    )
    chosen = (
        eligible.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy("loss_micro", "day")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("best_day"),
            F.col("loss_micro").alias("best_loss_micro"),
            "stop_day",
            "stop_t",
        )
    )
    return chosen.crossJoin(F.broadcast(max_t)).select(
        "best_day",
        F.col("best_loss_micro").cast("long").alias(
            "best_loss_micro"
        ),
        "stop_day",
        F.coalesce("stop_t", "mt").cast("long").alias("epochs_run"),
    )


# --------------------------------------------------------------------------
# sim_rank_fusion
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOP = 10


@query(
    "sim_rank_fusion",
    oracle=f"""
    WITH sig AS (
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS a,
               CAST(length(list_distinct(string_split(text, ' ')))
                    AS BIGINT) AS b
        FROM documents
    ),
    ra AS (
        SELECT doc_id, row_number() OVER (
                   ORDER BY a DESC, doc_id) AS rk_a
        FROM sig
    ),
    rb AS (
        SELECT doc_id, row_number() OVER (
                   ORDER BY b DESC, doc_id) AS rk_b
        FROM sig
    ),
    fused AS (
        SELECT ra.doc_id, ra.rk_a, rb.rk_b,
               (2000000 + ({_RRF_K} + ra.rk_a))
                   // (2 * ({_RRF_K} + ra.rk_a))
               + (2000000 + ({_RRF_K} + rb.rk_b))
                   // (2 * ({_RRF_K} + rb.rk_b)) AS rrf_micro
        FROM ra JOIN rb ON rb.doc_id = ra.doc_id
    )
    SELECT doc_id, CAST(rk_a AS BIGINT) AS rank_length,
           CAST(rk_b AS BIGINT) AS rank_richness,
           CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
                   ORDER BY rrf_micro DESC, doc_id) AS rnk
        FROM fused
    ) WHERE rnk <= {_RRF_TOP}
    """,
)
def sim_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion over two retrieval orderings (length
    rank and vocabulary-richness rank stand in for the BM25 and
    vector lists of a hybrid search stack): RRF(d) = Σ 1/(k + r_i)
    with k={_RRF_K}, each reciprocal half-up micro-rounded so the
    fused score is an exact BIGINT sum. RRF's whole point is that it
    fuses RANKS, never scores — no calibration between a BM25 score
    and a cosine is needed, which is why it's the default combiner
    in hybrid search engines. Top-{_RRF_TOP} fused with total-order
    tiebreaks.

    Scale: two rank windows over the candidate set (per query at
    fleet scale, group-limited), one doc-grain join, a partial
    top-k."""
    sig = io.load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("long").alias("a"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("b"),
    )
    ra = sig.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("a").desc(), "doc_id"))
        .alias("rk_a"),
    )
    rb = sig.select(
        F.col("doc_id").alias("db"),
        F.row_number()
        .over(Window.orderBy(F.col("b").desc(), "doc_id"))
        .alias("rk_b"),
    )
    fused = ra.join(rb, F.col("doc_id") == F.col("db")).select(
        "doc_id",
        "rk_a",
        "rk_b",
        (
            F.expr(
                f"(2000000 + ({_RRF_K} + rk_a))"
                f" div (2 * ({_RRF_K} + rk_a))"
            )
            + F.expr(
                f"(2000000 + ({_RRF_K} + rk_b))"
                f" div (2 * ({_RRF_K} + rk_b))"
            )
        ).alias("rrf_micro"),
    )
    wr = Window.orderBy(F.col("rrf_micro").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= _RRF_TOP)
        .select(
            "doc_id",
            F.col("rk_a").cast("long").alias("rank_length"),
            F.col("rk_b").cast("long").alias("rank_richness"),
            F.col("rrf_micro").cast("long").alias("rrf_micro"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# --------------------------------------------------------------------------
# agg_backlog_curve
# --------------------------------------------------------------------------


@query(
    "agg_backlog_curve",
    oracle="""
    WITH ordered AS (
        SELECT CAST(o.o_orderdate AS DATE) AS day,
               count(*) AS n_in, 0 AS n_out
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    ),
    shipped AS (
        SELECT CAST(l_shipdate AS DATE) AS day, 0 AS n_in,
               count(*) AS n_out
        FROM lineitem GROUP BY 1
    ),
    merged AS (
        SELECT day, sum(n_in) AS n_in, sum(n_out) AS n_out
        FROM (SELECT * FROM ordered UNION ALL SELECT * FROM shipped)
        GROUP BY day
    ),
    curve AS (
        SELECT day, n_in, n_out,
               sum(n_in - n_out) OVER (ORDER BY day) AS backlog
        FROM merged
    )
    SELECT day,
           CAST(n_in AS BIGINT) AS lines_ordered,
           CAST(n_out AS BIGINT) AS lines_shipped,
           CAST(backlog AS BIGINT) AS backlog,
           CAST(CASE WHEN row_number() OVER (
                         ORDER BY backlog DESC, day) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS is_peak
    FROM curve
    """,
)
def agg_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fulfillment burndown: per calendar day, lines entering the
    queue (by order date) and leaving it (by ship date), with the
    running backlog = cumulative in minus cumulative out and the
    peak day flagged. A backlog that trends up is demand outrunning
    fulfillment; the peak day and its height size the capacity
    decision. One merged daily grid, exact counts, one ordered
    cumulative window.

    Scale: both feeds collapse to day grain first (map-side
    partials); the cumulative window runs over the calendar (per
    warehouse key at fleet scale); the peak is a partial rank."""
    li = io.load_table(spark, sf_dir, "lineitem")
    orders = io.load_table(spark, sf_dir, "orders")
    ordered = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n_in"))
        .withColumn("n_out", F.lit(0))
    )
    shipped = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.count("*").alias("n_out"))
        .withColumn("n_in", F.lit(0))
        .select("day", "n_in", "n_out")
    )
    merged = (
        ordered.select("day", "n_in", "n_out")
        .unionAll(shipped)
        .groupBy("day")
        .agg(
            F.sum("n_in").alias("n_in"),
            F.sum("n_out").alias("n_out"),
        )
    )
    wo = Window.orderBy("day")
    curve = merged.select(
        "day",
        "n_in",
        "n_out",
        F.sum(F.col("n_in") - F.col("n_out"))
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("backlog"),
    )
    wp = Window.orderBy(F.col("backlog").desc(), "day")
    return curve.select(
        "day",
        F.col("n_in").cast("long").alias("lines_ordered"),
        F.col("n_out").cast("long").alias("lines_shipped"),
        F.col("backlog").cast("long").alias("backlog"),
        F.when(F.row_number().over(wp) == 1, 1)
        .otherwise(0)
        .cast("long")
        .alias("is_peak"),
    )
