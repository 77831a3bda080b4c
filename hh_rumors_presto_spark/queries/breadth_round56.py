"""Round-56 breadth batch: log-template mining, embedding
anisotropy, and the discrete hazard curve.

- ``text_template_mining`` — Drain-style log templating, the
  one-pass core: mask every digit run to '#', count the resulting
  templates, and report the head with its coverage — turning a
  million log lines into the twenty shapes they actually are is
  the first step of every log-analytics pipeline.
- ``emb_anisotropy`` — Ethayarajh-style anisotropy: the MEAN
  PAIRWISE COSINE of the embedding space computed without forming
  a single pair — (||Σ v̂||² - n) / (n(n-1)) from the exact integer
  component sums of micro-quantized unit vectors. High anisotropy
  means the space has collapsed into a cone and cosine similarity
  is mostly measuring the cone, not content — the embedding-health
  gate to run before trusting any sim_* number.
- ``agg_hazard_curve`` — the discrete churn hazard by tenure week:
  P(churn at week t | survived to t) from exact at-risk/churned
  counts — the retention team's view of the same lifetimes
  ts_kaplan_meier integrates into survival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# text_template_mining
# --------------------------------------------------------------------------

_TM_TOP = 20


@query(
    "text_template_mining",
    oracle=f"""
    WITH tpl AS (
        SELECT regexp_replace(text, '[0-9]+', '#', 'g') AS template
        FROM documents
    ),
    counted AS (
        SELECT template, count(*) AS n FROM tpl GROUP BY template
    ),
    ranked AS (
        SELECT template, n,
               row_number() OVER (ORDER BY n DESC, template) AS rnk,
               sum(n) OVER () AS total
        FROM counted
    )
    SELECT CAST(rnk AS BIGINT) AS rnk,
           substring(template, 1, 80) AS template_head,
           CAST(n AS BIGINT) AS n,
           CAST((2000000 * n + total) // (2 * total) AS BIGINT)
               AS share_micro
    FROM ranked WHERE rnk <= {_TM_TOP}
    """,
)
def text_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-template mining, the deterministic core of Drain: mask
    every digit run to '#' so lines that differ only in IDs,
    counters, and timestamps collapse onto one template, then rank
    templates by frequency (top-{_TM_TOP} with per-template share in
    integral micro units; heads truncated to 80 chars for the
    report). On real logs this is the step that turns millions of
    lines into dozens of shapes — after which "new template never
    seen before" is itself the best anomaly signal in the stack.

    Scale: a narrow regexp map then a template-grain count with
    map-side partials; the rank runs over the template vocabulary,
    not the corpus."""
    tpl = io.load_table(spark, sf_dir, "documents").select(
        F.regexp_replace("text", "[0-9]+", "#").alias("template")
    )
    counted = tpl.groupBy("template").agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), "template")
    wt = Window.partitionBy()
    return (
        counted.withColumn("rnk", F.row_number().over(wr))
        .withColumn("total", F.sum("n").over(wt))
        .filter(F.col("rnk") <= _TM_TOP)
        .select(
            F.col("rnk").cast("long").alias("rnk"),
            F.substring("template", 1, 80).alias("template_head"),
            F.col("n").cast("long").alias("n"),
            F.expr(
                "(2000000 * n + total) div (2 * total)"
            ).alias("share_micro"),
        )
    )


# --------------------------------------------------------------------------
# emb_anisotropy
# --------------------------------------------------------------------------


@query(
    "emb_anisotropy",
    oracle="""
    WITH comp AS (
        SELECT vec_id, u.dim, CAST(u.val AS DOUBLE) AS val
        FROM embeddings,
             LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[]))
                          AS val,
                      generate_subscripts(
                          CAST(embedding AS DOUBLE[]), 1) AS dim) u
    ),
    norms AS (
        SELECT vec_id, sqrt(sum(val * val)) AS nrm
        FROM comp GROUP BY vec_id
    ),
    unitc AS (
        SELECT c.dim,
               CAST(floor(1000000.0 * c.val / n.nrm + 0.5) AS BIGINT)
                   AS u_micro
        FROM comp c JOIN norms n ON n.vec_id = c.vec_id
        WHERE n.nrm > 0
    ),
    dims AS (
        SELECT dim, sum(u_micro) AS s FROM unitc GROUP BY dim
    ),
    nn AS (SELECT count(*) AS n FROM norms WHERE nrm > 0)
    SELECT CAST(nn.n AS BIGINT) AS n_vectors,
           CAST(sum(s * s) AS BIGINT) AS sum_sq,
           round((CAST(sum(s * s) AS DOUBLE) / 1000000000000.0
                  - nn.n)
                 / (CAST(nn.n AS DOUBLE) * (nn.n - 1)), 6)
               AS anisotropy
    FROM dims CROSS JOIN nn
    GROUP BY nn.n
    """,
)
def emb_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space — the mean pairwise cosine —
    computed with ZERO pairs: normalize each vector, micro-quantize
    the unit components once, and use the identity
    mean_cos = (||Σ v̂||² - n) / (n(n-1)): per-dimension component
    sums are exact BIGINTs and ||Σ v̂||² is one fold over dims. A
    healthy space sits near 0; anisotropy near 1 means every vector
    points up the same cone and cosine similarity is saturated —
    run this before believing any similarity threshold
    (Ethayarajh 2019's contextual-embedding finding, as a gate).

    Scale: O(n·d) with map-side partials — the pairwise definition
    is O(n²·d); the identity is the whole trick."""
    comp = io.load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode("embedding").alias("dim0", "val0"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("val0").cast("double").alias("val"),
    )
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    ).filter(F.col("nrm") > 0)
    unitc = comp.join(F.broadcast(norms), "vec_id").select(
        "dim",
        F.floor(1000000.0 * F.col("val") / F.col("nrm") + 0.5)
        .cast("long")
        .alias("u_micro"),
    )
    dims = unitc.groupBy("dim").agg(F.sum("u_micro").alias("s"))
    nn = norms.agg(F.count("*").alias("n"))
    return (
        dims.crossJoin(F.broadcast(nn))
        .groupBy("n")
        .agg(F.sum(F.col("s") * F.col("s")).alias("sum_sq"))
        .select(
            F.col("n").cast("long").alias("n_vectors"),
            F.col("sum_sq").cast("long").alias("sum_sq"),
            F.round(
                (
                    F.col("sum_sq").cast("double") / 1000000000000.0
                    - F.col("n")
                )
                / (F.col("n").cast("double") * (F.col("n") - 1)),
                6,
            ).alias("anisotropy"),
        )
    )


# --------------------------------------------------------------------------
# agg_hazard_curve
# --------------------------------------------------------------------------


@query(
    "agg_hazard_curve",
    oracle="""
    WITH bounds AS (
        SELECT min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
        FROM events
    ),
    life AS (
        SELECT user_id,
               date_diff('day', b.d0,
                         max(CAST(CAST(e.ts AS TIMESTAMP) AS DATE)))
                   // 7 AS last_week
        FROM events e CROSS JOIN bounds b
        GROUP BY user_id, b.d0
    ),
    churn AS (
        SELECT last_week AS wk, count(*) AS churned
        FROM life GROUP BY last_week
    ),
    risk AS (
        SELECT wk, churned,
               sum(churned) OVER (ORDER BY wk DESC) AS at_risk
        FROM churn
    )
    SELECT CAST(wk AS BIGINT) AS tenure_week,
           CAST(churned AS BIGINT) AS churned,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST((2000000 * churned + at_risk) // (2 * at_risk)
               AS BIGINT) AS hazard_micro
    FROM risk
    """,
)
def agg_hazard_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete churn hazard by tenure week: each user's lifetime
    ends at their last active week (relative to stream start);
    hazard(t) = churned(t) / at-risk(t), where the at-risk set is a
    reverse cumulative sum over the week histogram — users whose
    last week is >= t. Exact counts, integral micro divisions. The
    hazard shape is what retention work actually targets (a week-1
    spike means onboarding; a flat tail means a loyal core) —
    ts_kaplan_meier shows the same lifetimes as survival, this
    shows WHERE the survival curve loses its mass.

    Scale: user-grain fold, a week-histogram reverse cumsum over
    calendar-sized rows."""
    ev = io.load_events(spark, sf_dir)
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    life = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.floor(
                F.datediff(
                    F.max(F.col("ts").cast("date")), F.first("d0")
                )
                / 7
            )
            .cast("long")
            .alias("last_week")
        )
    )
    churn = life.groupBy(F.col("last_week").alias("wk")).agg(
        F.count("*").alias("churned")
    )
    wrev = Window.orderBy(F.col("wk").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = churn.select(
        "wk",
        "churned",
        F.sum("churned").over(wrev).alias("at_risk"),
    )
    return risk.select(
        F.col("wk").cast("long").alias("tenure_week"),
        F.col("churned").cast("long").alias("churned"),
        F.col("at_risk").cast("long").alias("at_risk"),
        F.expr(
            "(2000000 * churned + at_risk) div (2 * at_risk)"
        ).alias("hazard_micro"),
    )
