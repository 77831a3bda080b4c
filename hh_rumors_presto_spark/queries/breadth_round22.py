"""Round-22 breadth batch: SLO burn-rate alerting, deterministic
k-center initialization, and the embedding dimension-variance audit.

- ``ts_sli_burn_rate`` — the Google-SRE multi-window error-budget
  burn-rate alert: hourly error ratios against a 99% SLO, 1h and
  trailing-6h burn rates as EXACT integer micro units, page only when
  both windows burn >14.4x — the alerting policy that survives noise.
- ``emb_kcenter_init`` — farthest-point (k-center greedy) seeding, the
  deterministic 2-approximation initializer for k-means / IVF
  training: 4 unrolled argmax-of-min-distance rounds on micro-quantized
  integer L2 — every pick value-hash-pinned (no RNG anywhere).
- ``emb_dim_variance`` — per-dimension mean/variance of the embedding
  space from exact milli-quantized integer moments — the "which axes
  carry signal" audit that precedes PCA/truncation decisions
  (emb_pca_power / emb_truncate_quality are the downstream acts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# --------------------------------------------------------------------------
# ts_sli_burn_rate
# --------------------------------------------------------------------------

_BR_SLO_MICRO = 14_400_000  # 14.4x budget burn (Google SRE page threshold)


@query(
    "ts_sli_burn_rate",
    oracle=f"""
    WITH ev AS (
        SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
        FROM events
    ),
    base AS (SELECT min(hr) AS hr0 FROM ev),
    hourly AS (
        SELECT e.hr - b.hr0 AS hr_rel,
               sum(is_err) AS errors, count(*) AS total
        FROM ev e CROSS JOIN base b
        GROUP BY e.hr - b.hr0
    ),
    rates AS (
        SELECT hr_rel, errors, total,
               errors * 100000000 // total AS burn1_micro,
               sum(errors) OVER w6 * 100000000 // sum(total) OVER w6
                   AS burn6_micro
        FROM hourly
        WINDOW w6 AS (ORDER BY hr_rel
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(hr_rel AS BIGINT) AS hr_rel,
           CAST(errors AS BIGINT) AS errors,
           CAST(total AS BIGINT) AS total,
           CAST(burn1_micro AS BIGINT) AS burn1_micro,
           CAST(burn6_micro AS BIGINT) AS burn6_micro,
           burn1_micro > {_BR_SLO_MICRO} AND burn6_micro > {_BR_SLO_MICRO}
               AS page
    FROM rates
    """,
)
def ts_sli_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error-budget burn rate (the Google SRE workbook
    alerting policy): with a 99% SLO the error budget is 1%, so the
    burn rate is error_ratio / 1% = errors·100/total — kept as EXACT
    integer micro units (errors·1e8 DIV total). An hour pages only
    when BOTH the 1h and the trailing-6h windows burn above 14.4x —
    fast enough to catch an outage, immune to a single noisy hour.
    Hours are indexed RELATIVE to the stream start so the key is
    session-timezone-invariant.

    Scale: the fact collapses to hourly (errors, total) partials
    map-side; the 6h RANGE window runs over the hour series —
    calendar-sized, ordered by an integer, no fact-sized window."""
    ev = io.load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) DIV 3600000000").alias("hr"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    base = ev.agg(F.min("hr").alias("hr0"))
    hourly = (
        ev.crossJoin(F.broadcast(base))
        .groupBy((F.col("hr") - F.col("hr0")).alias("hr_rel"))
        .agg(
            F.sum("is_err").alias("errors"),
            F.count("*").alias("total"),
        )
    )
    w6 = Window.orderBy("hr_rel").rangeBetween(-5, 0)
    rates = hourly.select(
        "hr_rel",
        "errors",
        "total",
        F.expr("errors * 100000000 DIV total").alias("burn1_micro"),
        (F.sum("errors").over(w6) * 100000000).alias("_err6x"),
        F.sum("total").over(w6).alias("_tot6"),
    )
    return rates.select(
        F.col("hr_rel").cast("long").alias("hr_rel"),
        F.col("errors").cast("long").alias("errors"),
        F.col("total").cast("long").alias("total"),
        F.col("burn1_micro").cast("long").alias("burn1_micro"),
        F.expr("_err6x DIV _tot6").cast("long").alias("burn6_micro"),
        (
            (F.col("burn1_micro") > _BR_SLO_MICRO)
            & (F.expr("_err6x DIV _tot6") > _BR_SLO_MICRO)
        ).alias("page"),
    )


# --------------------------------------------------------------------------
# emb_kcenter_init
# --------------------------------------------------------------------------

_KC_K = 4


def _q_sql(col: str) -> str:
    """Micro-quantize a FLOAT[] to BIGINT components (DuckDB)."""
    return (
        f"list_transform({col}, v -> CAST(floor(CAST(v AS DOUBLE)"
        " * 1000000.0 + 0.5) AS BIGINT))"
    )


def _d2_sql(a: str, b: str) -> str:
    """Exact integer squared L2 between two quantized lists (DuckDB)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _kc_round_sql(i: int) -> str:
    """Round i (i >= 2): min-dist to centers so far, then argmax."""
    prev_md = f"md{i - 1}"
    return f"""
    {prev_md} AS (
        SELECT q.vec_id, q.qe,
               {"least(m.d2, " + _d2_sql("q.qe", "c.qe") + ")" if i > 2 else _d2_sql("q.qe", "c.qe")} AS d2
        FROM q
        {f"JOIN md{i - 2} m ON m.vec_id = q.vec_id" if i > 2 else ""}
        CROSS JOIN c{i - 1} c
    ),
    c{i} AS (
        SELECT vec_id, qe, d2 FROM (
            SELECT *, row_number() OVER (ORDER BY d2 DESC, vec_id) AS rr
            FROM {prev_md}
        ) WHERE rr = 1
    )"""


@query(
    "emb_kcenter_init",
    oracle="WITH q AS (SELECT vec_id, "
    + _q_sql("embedding")
    + """ AS qe FROM embeddings),
    c1 AS (
        SELECT vec_id, qe, CAST(0 AS BIGINT) AS d2 FROM q
        ORDER BY vec_id LIMIT 1
    ),
    """
    + ",".join(_kc_round_sql(i) for i in range(2, _KC_K + 1))
    + """
    SELECT CAST(sel_round AS BIGINT) AS sel_round, vec_id,
           CAST(d2 AS BIGINT) AS sel_d2
    FROM (
        SELECT 1 AS sel_round, vec_id, d2 FROM c1
        UNION ALL SELECT 2, vec_id, d2 FROM c2
        UNION ALL SELECT 3, vec_id, d2 FROM c3
        UNION ALL SELECT 4, vec_id, d2 FROM c4
    )
    """,
)
def emb_kcenter_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-point (k-center greedy) seeding — the deterministic
    2-approximation initializer that replaces k-means++'s RNG: start
    from the smallest vec_id, then 3 times pick the point FARTHEST
    from the chosen set (argmax of min squared distance, ties to the
    smallest id). Distances are EXACT integer L2 on micro-quantized
    components, so every pick — including knife-edge ties — is
    value-hash-pinned and the SQL oracle unrolls the same 4 rounds.

    Scale: each round is one broadcast of the (single) new center +
    one corpus pass folding the running min-distance (carried as a
    column, localCheckpoint per round) + one 1-row argmax —
    k passes total, never a pairwise join. This is exactly how IVF
    coarse quantizers are seeded at corpus scale."""
    q = (
        io.load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
                " * 1000000.0 + 0.5) AS BIGINT))"
            ).alias("qe"),
        )
        .localCheckpoint()
    )
    d2_expr = (
        "aggregate(zip_with(qe, c_qe, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    first = (
        q.orderBy("vec_id")
        .limit(1)
        .select("vec_id", "qe", F.lit(0).cast("long").alias("d2"))
        .localCheckpoint()
    )
    centers = [first]
    md = None
    for rnd in range(2, _KC_K + 1):
        c_prev = centers[-1].select(
            F.col("qe").alias("c_qe")
        )
        with_d = q.crossJoin(F.broadcast(c_prev)).select(
            "vec_id", "qe", F.expr(d2_expr).alias("d2_new")
        )
        if md is None:
            md = with_d.select(
                "vec_id", "qe", F.col("d2_new").alias("d2")
            ).localCheckpoint()
        else:
            md = (
                with_d.join(
                    md.select("vec_id", F.col("d2").alias("d2_old")),
                    "vec_id",
                )
                .select(
                    "vec_id",
                    "qe",
                    F.least("d2_new", "d2_old").alias("d2"),
                )
                .localCheckpoint()
            )
        pick = (
            md.withColumn(
                "rr",
                F.row_number().over(
                    Window.orderBy(F.col("d2").desc(), "vec_id")
                ),
            )
            .filter(F.col("rr") == 1)
            .select("vec_id", "qe", "d2")
            .localCheckpoint()
        )
        centers.append(pick)
    out = None
    for i, c in enumerate(centers, start=1):
        row = c.select(
            F.lit(i).cast("long").alias("sel_round"),
            "vec_id",
            F.col("d2").cast("long").alias("sel_d2"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# emb_dim_variance
# --------------------------------------------------------------------------


@query(
    "emb_dim_variance",
    oracle="""
    WITH comp AS (
        SELECT u.i - 1 AS dim,
               CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 1000.0 + 0.5)
                    AS BIGINT) AS v
        FROM embeddings e,
             LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) u
    ),
    m AS (
        SELECT dim, count(*) AS n, sum(v) AS s, sum(v * v) AS s2
        FROM comp GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
           round(CAST(s AS DOUBLE) / n, 6) AS mean_milli,
           round((CAST(n AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s)
                 / (CAST(n AS DOUBLE) * n), 4) AS var_milli2,
           CAST(row_number() OVER (
                    ORDER BY (CAST(n AS DOUBLE) * s2 - CAST(s AS DOUBLE) * s)
                             / (CAST(n AS DOUBLE) * n) DESC, dim)
                AS BIGINT) AS var_rank
    FROM m
    """,
)
def emb_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean and (population) variance of the embedding
    space, ranked by variance — the signal-concentration audit run
    before choosing PCA / Matryoshka truncation cut-offs
    (emb_pca_power and emb_truncate_quality act on its answer).
    Components are milli-quantized to integers so the moment sums are
    EXACT BIGINTs with wide headroom (the only floats are the final
    two divisions), and the variance ranking is deterministic.

    Scale: posexplode is a narrow fan-out (rows x dims), the moment
    aggregate combines map-side, and the ranked output is
    dims-sized."""
    comp = io.load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(
            F.expr(
                "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE)"
                " * 1000.0 + 0.5) AS BIGINT))"
            )
        ).alias("dim", "v")
    )
    m = comp.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    var = (nd * F.col("s2") - F.col("s").cast("double") * F.col("s")) / (
        nd * F.col("n")
    )
    return m.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
            "mean_milli"
        ),
        F.round(var, 4).alias("var_milli2"),
        F.row_number()
        .over(Window.orderBy(var.desc(), "dim"))
        .cast("long")
        .alias("var_rank"),
    )
