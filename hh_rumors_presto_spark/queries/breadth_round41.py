"""Round-41 breadth batch: degree assortativity, tokenizer character
coverage, and a lagged-predictor (Granger-style) test.

- ``graph_assortativity`` — Newman's degree assortativity: the
  Pearson correlation of endpoint degrees over the edge list, from
  exact integer edge moments with ONE final formula. Negative r =
  hubs attach to leaves (the disassortative signature of bipartite
  commerce graphs); the one-number structure summary next to the
  coreness/clustering keys.
- ``text_char_coverage`` — the SentencePiece character_coverage
  planner: frequency-ranked character cumulative coverage, the
  alphabet sizes needed for 99.9% / 99.95%, and the head-100 share —
  integer cross-multiplied cuts, no float shares.
- ``ts_granger_lite`` — does YESTERDAY's view total improve today's
  purchase prediction beyond purchase's own lag? Nested-OLS F test
  (the Granger-causality primitive at lag 1): both regressions
  solved in closed form from exact integer moment sums, one F
  statistic out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.queries.graph import _GRAPH_SQL, _edges
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# graph_assortativity
# --------------------------------------------------------------------------


@query(
    "graph_assortativity",
    oracle=_GRAPH_SQL
    + """
    SELECT CAST(m.n AS BIGINT) AS n_edges,
           round((m.n * m.sxy - m.sx * m.sy)
                 / sqrt((CAST(m.n AS DOUBLE) * m.sxx - CAST(m.sx AS DOUBLE) * m.sx)
                        * (CAST(m.n AS DOUBLE) * m.syy
                           - CAST(m.sy AS DOUBLE) * m.sy)), 6)
               AS assortativity
    FROM (
        SELECT count(*) AS n,
               sum(ds.outdeg) AS sx, sum(dd.outdeg) AS sy,
               sum(ds.outdeg * dd.outdeg) AS sxy,
               sum(ds.outdeg * ds.outdeg) AS sxx,
               sum(dd.outdeg * dd.outdeg) AS syy
        FROM edges e
        JOIN deg ds ON ds.node = e.src
        JOIN deg dd ON dd.node = e.dst
    ) m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the bipartite order graph: Pearson r
    between the degrees of edge endpoints, over the (doubled,
    symmetric) edge list. All five moments are exact BIGINT sums of
    integer degrees; r is one closed-form float expression. r < 0
    is the disassortative commerce signature — big customers buy
    from many small suppliers and vice versa — and a sharp drop in
    |r| between snapshots flags structural drift.

    Scale: degrees are one edge groupBy; the moment pass joins the
    edge list against the node-sized degree table twice (broadcast
    at dimension scale, co-partitioned at web scale) and folds to
    one row. No windows, no pairs beyond the edges themselves."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    m = (
        edges.join(
            F.broadcast(
                deg.select(
                    F.col("node").alias("sn"),
                    F.col("outdeg").alias("x"),
                )
            ),
            F.col("src") == F.col("sn"),
        )
        .join(
            F.broadcast(
                deg.select(
                    F.col("node").alias("dn"),
                    F.col("outdeg").alias("y"),
                )
            ),
            F.col("dst") == F.col("dn"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    dy = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(num / F.sqrt(dx * dy), 6).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# text_char_coverage
# --------------------------------------------------------------------------


@query(
    "text_char_coverage",
    oracle="""
    WITH ch AS (
        SELECT unnest(string_split(text, '')) AS c FROM documents
    ),
    freq AS (
        SELECT c, count(*) AS n FROM ch WHERE c <> '' GROUP BY c
    ),
    ranked AS (
        SELECT c, n,
               sum(n) OVER (ORDER BY n DESC, c) AS cum,
               sum(n) OVER () AS total,
               row_number() OVER (ORDER BY n DESC, c) AS rk
        FROM freq
    )
    SELECT CAST(max(total) AS BIGINT) AS total_chars,
           CAST(count(*) AS BIGINT) AS distinct_chars,
           CAST(sum(CASE WHEN 1000 * (cum - n) < 999 * total
                    THEN 1 ELSE 0 END) AS BIGINT) AS alpha_999,
           CAST(sum(CASE WHEN 10000 * (cum - n) < 9995 * total
                    THEN 1 ELSE 0 END) AS BIGINT) AS alpha_9995,
           CAST((2000000 * max(CASE WHEN rk <= 100 THEN cum END)
            + max(total)) // (2 * max(total)) AS BIGINT)
               AS top100_micro
    FROM ranked
    """,
)
def text_char_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SentencePiece character_coverage planner: rank characters
    by corpus frequency and report the alphabet sizes needed to
    cover 99.9% and 99.95% of all character occurrences (a char is
    needed while coverage BEFORE it is still under the target —
    integer cross-multiplication, no 0.9995*total float), plus the
    share the top-100 characters carry. This is the number you set
    before training a tokenizer: too high and the vocab drowns in
    one-off glyphs, too low and real text maps to <unk>.

    Scale: one character explode to a |alphabet|-sized frequency
    table (map-side partials); the rank window runs over the
    alphabet, not the corpus."""
    ch = io.load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", "")).alias("c")
    )
    freq = (
        ch.filter(F.col("c") != "")
        .groupBy("c")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), "c")
    wt = Window.partitionBy()
    ranked = freq.select(
        "n",
        F.sum("n").over(
            wr.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("n").over(wt).alias("total"),
        F.row_number().over(wr).alias("rk"),
    )
    return ranked.agg(
        F.max("total").cast("long").alias("total_chars"),
        F.count("*").alias("distinct_chars"),
        F.sum(
            F.when(
                1000 * (F.col("cum") - F.col("n"))
                < 999 * F.col("total"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("alpha_999"),
        F.sum(
            F.when(
                10000 * (F.col("cum") - F.col("n"))
                < 9995 * F.col("total"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("alpha_9995"),
        F.floor(
            (
                2000000
                * F.max(
                    F.when(F.col("rk") <= 100, F.col("cum"))
                )
                + F.max("total")
            )
            / (2 * F.max("total"))
        )
        .cast("long")
        .alias("top100_micro"),
    )


# --------------------------------------------------------------------------
# ts_granger_lite
# --------------------------------------------------------------------------


@query(
    "ts_granger_lite",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(floor(CAST(value AS DOUBLE) + 0.5)
                             AS BIGINT) ELSE 0 END) AS y,
               sum(CASE WHEN event_type = 'view'
                   THEN CAST(floor(CAST(value AS DOUBLE) + 0.5)
                             AS BIGINT) ELSE 0 END) AS v
        FROM events WHERE value IS NOT NULL
        GROUP BY 1
    ),
    lagged AS (
        SELECT y,
               lag(y) OVER (ORDER BY day) AS x,
               lag(v) OVER (ORDER BY day) AS z
        FROM daily
    ),
    pts AS (SELECT y, x, z FROM lagged WHERE x IS NOT NULL),
    m AS (
        SELECT count(*) AS n,
               sum(y) AS sy, sum(x) AS sx, sum(z) AS sz,
               sum(x * y) AS sxy, sum(z * y) AS szy,
               sum(x * z) AS sxz,
               sum(x * x) AS sxx, sum(z * z) AS szz,
               sum(y * y) AS syy
        FROM pts
    ),
    c AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS cxy,
               CAST(n * szy - sz * sy AS DOUBLE) AS czy,
               CAST(n * sxz - sx * sz AS DOUBLE) AS cxz,
               CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
               CAST(n * szz - sz * sz AS DOUBLE) AS czz,
               CAST(n * syy - sy * sy AS DOUBLE) AS cyy
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round((cyy - (cxy * cxy) / cxx)
                 / (cyy - ((czz * cxy - cxz * czy) * cxy
                           + (cxx * czy - cxz * cxy) * czy)
                          / (cxx * czz - cxz * cxz))
                 - 1.0, 6) AS sse_ratio_minus_1,
           round(((cyy - (cxy * cxy) / cxx)
                  / (cyy - ((czz * cxy - cxz * czy) * cxy
                            + (cxx * czy - cxz * cxy) * czy)
                           / (cxx * czz - cxz * cxz))
                  - 1.0) * (n - 3), 6) AS f_stat
    FROM c
    """,
)
def ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-style nested-model test: does yesterday's VIEW
    total carry information about today's PURCHASE total beyond
    yesterday's purchases? Both OLS fits (restricted y~y_lag,
    unrestricted y~y_lag+v_lag) are solved in closed form from ONE
    set of exact BIGINT moment sums — n-scaled centering keeps every
    centered moment an exact integer before the single double-
    precision formula; F = (SSE_r/SSE_u - 1)*(n-3) for the one
    added regressor. F >> 4 says views lead purchases — the
    cross-metric lead-lag readout next to win_rolling_corr's
    contemporaneous coupling.

    Scale: the fact collapses to daily (y, v) rows; the lag pass and
    the 10-moment fold run over the calendar-sized series (per
    series pair at fleet scale). Whole-dollar quantization keeps
    moment products comfortably inside BIGINT at any realistic
    scale."""
    daily = (
        io.load_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value").cast("double") + 0.5).cast(
                        "long"
                    ),
                ).otherwise(F.lit(0))
            ).alias("y"),
            F.sum(
                F.when(
                    F.col("event_type") == "view",
                    F.floor(F.col("value").cast("double") + 0.5).cast(
                        "long"
                    ),
                ).otherwise(F.lit(0))
            ).alias("v"),
        )
    )
    wo = Window.orderBy("day")
    pts = daily.select(
        "y",
        F.lag("y").over(wo).alias("x"),
        F.lag("v").over(wo).alias("z"),
    ).filter(F.col("x").isNotNull())
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("z") * F.col("y")).alias("szy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    cxy = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    czy = (n * F.col("szy") - F.col("sz") * F.col("sy")).cast("double")
    cxz = (n * F.col("sxz") - F.col("sx") * F.col("sz")).cast("double")
    cxx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    czz = (n * F.col("szz") - F.col("sz") * F.col("sz")).cast("double")
    cyy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    sse_r = cyy - (cxy * cxy) / cxx
    det = cxx * czz - cxz * cxz
    sse_u = cyy - (
        (czz * cxy - cxz * czy) * cxy + (cxx * czy - cxz * cxy) * czy
    ) / det
    ratio = sse_r / sse_u - F.lit(1.0)
    return m.select(
        n.cast("long").alias("n_obs"),
        F.round(ratio, 6).alias("sse_ratio_minus_1"),
        F.round(ratio * (n - 3), 6).alias("f_stat"),
    )
