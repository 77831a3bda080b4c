"""Round-6 breadth batch: a value-verifiable HyperLogLog, CCNet-style
perplexity bucketing, and a sampled-estimate accuracy floor.

- ``sketch_hll_det`` — a REAL HyperLogLog (Flajolet et al. 2007) built
  from an engine-neutral md5 hash, so unlike ``agg_approx_distinct`` /
  ``sketch_hll_merge`` (rows-only: Spark's internal sketch), every
  register and the final estimate are value-hash-verified against DuckDB.
  The register table IS the mergeable sketch state: groupBy(group, bucket)
  max(rho) is exactly the HLL merge operator, so partial aggregation
  gives the map-side-combine sketch build for free.
- ``corpus_ccnet_buckets`` — the CCNet corpus partition (Wenzek et al.
  2019, arXiv:1911.00359): score every document with a unigram-LM
  log-prob (perplexity proxy), then split the corpus into head / middle /
  tail at the global score tertiles.
- ``aqp_sample_mean`` — approximate-query-processing floor: a 10%
  deterministic hash sample's group means vs the exact means, with the
  relative error REPORTED AND GATED (the sampling-accuracy evidence an
  AQP path needs before anyone trusts it at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query
from hh_rumors_presto_spark.session import default_parallelism

# --------------------------------------------------------------------------
# sketch_hll_det
# --------------------------------------------------------------------------

_HLL_M = 256  # registers (b = 8 bucket bits); std error ~ 1.04/sqrt(m) = 6.5%
# 52 bits of rank material remain after the bucket byte (13 hex chars)
_HLL_RANK_HEX = 13

# alpha_256 * m^2 * 2^53, written as arithmetic both engines evaluate
# identically (IEEE doubles, fixed association) rather than a rounded
# literal. 2^53 rescales the integer-exact register sum (see below).
_HLL_SCALE_SQL = (
    f"(0.7213 / (1.0 + 1.079 / {_HLL_M})) * {_HLL_M * _HLL_M} * 9007199254740992.0"
)



def _hll_bucket_rho(hexd):
    """(bucket, rho) column pair from an md5-hex column — the ONE
    Spark-side definition of the register machinery, shared by
    sketch_hll_det and sketch_hll_setops (the SQL twin is
    _hll_ranked_sql / the ranked CTE)."""
    stripped = F.regexp_replace(
        F.substring(hexd, 3, _HLL_RANK_HEX), "^0+", ""
    )
    nib = F.substring(stripped, 1, 1)
    rho = F.when(stripped == "", 4 * _HLL_RANK_HEX + 1).otherwise(
        4 * (_HLL_RANK_HEX - F.length(stripped))
        + F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1
    )
    bucket = F.conv(F.substring(hexd, 1, 2), 16, 10).cast("long")
    return bucket, rho


@query(
    "sketch_hll_det",
    oracle=f"""
    WITH h AS (
        SELECT l_returnflag AS grp, l_partkey,
               md5(CAST(l_partkey AS VARCHAR)) AS hex
        FROM lineitem
    ),
    ranked AS (
        SELECT grp,
               CAST(('0x' || substring(hex, 1, 2)) AS BIGINT) AS bucket,
               CASE WHEN stripped = '' THEN {4 * _HLL_RANK_HEX + 1}
                    ELSE 4 * ({_HLL_RANK_HEX} - length(stripped))
                         + CASE WHEN nib = '1' THEN 3
                                WHEN nib IN ('2', '3') THEN 2
                                WHEN nib IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END
                         + 1 END AS rho
        FROM (
            SELECT grp, hex,
                   regexp_replace(substring(hex, 3, {_HLL_RANK_HEX}), '^0+', '')
                       AS stripped,
                   substring(regexp_replace(
                       substring(hex, 3, {_HLL_RANK_HEX}), '^0+', ''), 1, 1)
                       AS nib
            FROM h
        )
    ),
    regs AS (
        SELECT grp, bucket, max(rho) AS m_j FROM ranked GROUP BY grp, bucket
    ),
    est AS (
        SELECT grp,
               sum(CAST(pow(2, 53 - m_j) AS BIGINT)) AS sum_scaled,
               count(*) AS n_present
        FROM regs GROUP BY grp
    ),
    raw AS (
        SELECT grp,
               {_HLL_SCALE_SQL}
                 / CAST(sum_scaled
                        + ({_HLL_M} - n_present) * 9007199254740992 AS DOUBLE)
                   AS raw_est,
               {_HLL_M} - n_present AS v_empty
        FROM est
    ),
    truth AS (
        SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_ndv
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT r.grp AS l_returnflag,
           round(CASE WHEN r.raw_est <= 2.5 * {_HLL_M} AND r.v_empty > 0
                      THEN {_HLL_M} * ln({_HLL_M} / CAST(r.v_empty AS DOUBLE))
                      ELSE r.raw_est END, 4) AS hll_est,
           CAST(t.exact_ndv AS BIGINT) AS exact_ndv,
           round(abs(CASE WHEN r.raw_est <= 2.5 * {_HLL_M} AND r.v_empty > 0
                          THEN {_HLL_M} * ln({_HLL_M} / CAST(r.v_empty AS DOUBLE))
                          ELSE r.raw_est END - t.exact_ndv)
                 / t.exact_ndv, 6) AS rel_err
    FROM raw r JOIN truth t ON t.grp = r.grp
    """,
)
def sketch_hll_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog NDV per group, estimate vs exact truth.

    Hash = md5 of the value (engine-neutral): byte 1 picks one of 256
    registers, the remaining 52 bits give rho = leading-zero rank,
    computed by STRING arithmetic on the hex (strip leading '0' nibbles +
    a 4-way nibble CASE) — no float log2, whose last-ulp rounding differs
    per engine. Register sums are rescaled to INTEGER: sum(2^(53-rho))
    fits a BIGINT exactly, so the harmonic-mean denominator is exact
    under any reduction order and the estimate is bit-deterministic.

    Shape at scale: groupBy(group, bucket) max(rho) IS the HLL sketch —
    max is the merge operator, so Spark's partial aggregation builds and
    merges per-partition sketches map-side; the shuffle carries at most
    |groups| x 256 register rows no matter how many input rows. The
    measured rel_err column is the pinned quality floor (std error
    1.04/sqrt(256) ~ 6.5%). Unlike agg_approx_distinct (rows-only), this
    estimate is value-hash-verified.
    """
    li = io.load_table(spark, sf_dir, "lineitem")
    hexd = F.md5(F.col("l_partkey").cast("string"))
    bucket, rho = _hll_bucket_rho(hexd)
    ranked = li.select(
        F.col("l_returnflag").alias("grp"),
        bucket.alias("bucket"),
        rho.alias("rho"),
    )
    regs = ranked.groupBy("grp", "bucket").agg(F.max("rho").alias("m_j"))
    est = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), 53 - F.col("m_j")).cast("long")).alias(
            "sum_scaled"
        ),
        F.count("*").alias("n_present"),
    )
    two53 = 9007199254740992
    scale = (
        F.lit(0.7213 / (1.0 + 1.079 / _HLL_M)) * (_HLL_M * _HLL_M) * float(two53)
    )
    v_empty = _HLL_M - F.col("n_present")
    raw_est = scale / (
        F.col("sum_scaled") + v_empty * F.lit(two53)
    ).cast("double")
    final_est = F.when(
        (raw_est <= 2.5 * _HLL_M) & (v_empty > 0),
        _HLL_M * F.log(_HLL_M / v_empty.cast("double")),
    ).otherwise(raw_est)
    truth = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.countDistinct("l_partkey").alias("exact_ndv")
    )
    return (
        est.select("grp", final_est.alias("e"))
        .join(truth, "grp")
        .select(
            F.col("grp").alias("l_returnflag"),
            F.round("e", 4).alias("hll_est"),
            F.col("exact_ndv").cast("bigint").alias("exact_ndv"),
            F.round(
                F.abs(F.col("e") - F.col("exact_ndv")) / F.col("exact_ndv"), 6
            ).alias("rel_err"),
        )
    )


# alpha arithmetic must stay a PYTHON-SIDE constant expression identical to
# the SQL's: 0.7213/(1.0+1.079/256) evaluated once in CPython IEEE doubles
# == DuckDB evaluating the same literals. (Checked in tests.)


# --------------------------------------------------------------------------
# corpus_ccnet_buckets
# --------------------------------------------------------------------------

_CC_FLOOR = 1e-9  # OOV probability floor (matches text_lm_score's shape)


@query(
    "corpus_ccnet_buckets",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (SELECT tok, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY tok),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
        SELECT t.doc_id,
               round(avg(ln(v.cnt / total.n + {_CC_FLOOR})), 6) AS score6
        FROM tok t JOIN vocab v ON v.tok = t.tok, total
        GROUP BY t.doc_id
    ),
    cuts AS (
        SELECT list_sort(list(score6)) AS arr, count(*) AS n FROM scored
    ),
    cut2 AS (
        SELECT arr[CAST((n + 2) // 3 AS INT)] AS p33,
               arr[CAST((2 * n + 2) // 3 AS INT)] AS p66
        FROM cuts WHERE n > 0
    )
    SELECT s.doc_id, s.score6 AS avg_logp,
           CASE WHEN s.score6 >= c.p66 THEN 'head'
                WHEN s.score6 >= c.p33 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s, cut2 c
    """,
)
def corpus_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail corpus partition: per-document unigram-LM
    average log-prob (the perplexity proxy; higher = more fluent), split
    at the global score tertiles — the standard quality-tiering step
    before choosing what fraction of a crawl to train on.

    Cut discipline (round-8 fuzz-seed-20 find): scores are ROUNDED to
    their 6-decimal output grid BEFORE the cut, and the tertile cut is a
    DISCRETE order statistic — the ceil(n*p)-th smallest rounded score,
    index computed with integer arithmetic in both engines — not an
    interpolated percentile. Interpolated cuts mix adjacent values, so a
    TIE GROUP sitting exactly at the cut compares `>=` through each
    engine's own ulp noise (avg(ln(...)) reduction order differs) and
    two engines bucket the tied docs differently; a grid-valued cut that
    IS an element of the grid-valued score multiset removes the cut-side
    noise. Residual (documented, not eliminated): a doc whose TRUE
    avg(ln(...)) lies within reduction-order ulp noise of a 0.5e-6
    rounding boundary can still round to different score6 grid points per
    engine, shifting the sorted multiset and hence the cut itself — the
    same hazard the avg_logp output column carries. Fixture scores are
    empirically bounded away from such boundaries (8 fuzz seeds + the
    seed-20 trigger fixture all hash-match), but the guarantee is
    per-fixture, not universal.

    Empty-corpus edge (ADVICE r8): the ungrouped cuts agg yields one row
    with n=0 even when `scored` is empty, and element_at(arr, 0) raises
    INVALID_INDEX_OF_ZERO — so the cut row is filtered on n > 0 in BOTH
    engines, making empty-in → empty-out instead of crash-vs-empty.

    Shape at scale: vocab aggregate (map-side partials) broadcast back
    over the token stream; per-doc fold; the two tertile cuts are ONE
    single-row sorted-list aggregate broadcast over the scored corpus
    (the same buffer footprint as the exact-percentile aggregate it
    replaces — Spark's exact percentile also buffers the value multiset;
    at true corpus scale both would step down to approx_percentile)."""
    docs = io.load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count("*").cast("double").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("n") + _CC_FLOOR)), 6
            ).alias("score6")
        )
    )
    cuts = (
        scored.agg(
            F.sort_array(F.collect_list("score6")).alias("arr"),
            F.count("*").alias("n"),
        )
        .where(F.col("n") > 0)  # empty corpus: no cut row, never index 0
        .select(
            F.element_at(
                "arr", F.expr("CAST((n + 2) DIV 3 AS INT)")
            ).alias("p33"),
            F.element_at(
                "arr", F.expr("CAST((2 * n + 2) DIV 3 AS INT)")
            ).alias("p66"),
        )
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            F.col("score6").alias("avg_logp"),
            F.when(F.col("score6") >= F.col("p66"), "head")
            .when(F.col("score6") >= F.col("p33"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# --------------------------------------------------------------------------
# aqp_sample_mean
# --------------------------------------------------------------------------

_AQP_PCT = 10  # deterministic 10% hash sample


@query(
    "aqp_sample_mean",
    oracle=f"""
    WITH base AS (
        SELECT l_returnflag, l_quantity,
               CAST(('0x' || substring(md5(
                   CAST(l_orderkey AS VARCHAR) || '-' ||
                   CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                   AS h
        FROM lineitem
    ),
    exact AS (
        SELECT l_returnflag,
               sum(CAST(l_quantity AS BIGINT)) AS s, count(*) AS c
        FROM base GROUP BY l_returnflag
    ),
    samp AS (
        SELECT l_returnflag,
               sum(CAST(l_quantity AS BIGINT)) AS s, count(*) AS c
        FROM base WHERE h < {_AQP_PCT} GROUP BY l_returnflag
    )
    SELECT e.l_returnflag,
           round(CAST(e.s AS DOUBLE) / e.c, 6) AS exact_mean,
           round(CAST(s.s AS DOUBLE) / s.c, 6) AS sample_mean,
           CAST(s.c AS BIGINT) AS sample_rows,
           round(abs(CAST(s.s AS DOUBLE) / s.c - CAST(e.s AS DOUBLE) / e.c)
                 / (CAST(e.s AS DOUBLE) / e.c), 6) AS rel_err
    FROM exact e JOIN samp s ON s.l_returnflag = e.l_returnflag
    """,
)
def aqp_sample_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-query-processing accuracy floor: group means from a
    deterministic 10% hash sample vs the exact means, with measured
    relative error. The sample predicate is md5-derived (engine-neutral,
    reproducible, and — unlike TABLESAMPLE — stable under retries and
    across engines), so the whole comparison is value-hash-verified.

    Shape at scale: the sample predicate is a narrow filter in the scan's
    codegen stage (rows drop before any shuffle; being md5-derived it
    cannot push into parquet row-group stats — a production AQP path
    would materialize the sample as its own table to also cut the I/O);
    both sides are one keyed integer aggregate. Quantities are
    integer-valued, so the sums are exact and the means
    bit-deterministic."""
    li = io.load_table(spark, sf_dir, "lineitem")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    base = li.select(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q"), h.alias("h")
    )
    exact = base.groupBy("l_returnflag").agg(
        F.sum("q").alias("es"), F.count("*").alias("ec")
    )
    samp = (
        base.filter(F.col("h") < _AQP_PCT)
        .groupBy("l_returnflag")
        .agg(F.sum("q").alias("ss"), F.count("*").alias("sc"))
    )
    e_mean = F.col("es").cast("double") / F.col("ec")
    s_mean = F.col("ss").cast("double") / F.col("sc")
    return exact.join(samp, "l_returnflag").select(
        "l_returnflag",
        F.round(e_mean, 6).alias("exact_mean"),
        F.round(s_mean, 6).alias("sample_mean"),
        F.col("sc").cast("bigint").alias("sample_rows"),
        F.round(F.abs(s_mean - e_mean) / e_mean, 6).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# ml_logreg_gd
# --------------------------------------------------------------------------

_GD_ITERS = 3
_GD_LR = 1.0

# z association is fixed as ((w1*x1 + w2*x2) + w3*x3) in BOTH engines;
# gradients are rounded to 12 decimals between iterations in BOTH engines,
# which (a) absorbs last-ulp libm/exp and reduction-order drift before it
# can compound across iterations and (b) keeps every w_j an exact finite
# decimal both engines share.
_GD_FEATURES_SQL = """
    SELECT 1.0 AS x1,
           o_totalprice / 100000.0 AS x2,
           CAST(substring(o_orderpriority, 1, 1) AS INT) / 5.0 AS x3,
           CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
    FROM orders
"""


def _gd_oracle() -> str:
    ctes = [f"base AS ({_GD_FEATURES_SQL})",
            "w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"]
    prev = "w0"
    for i in range(1, _GD_ITERS + 1):
        p = f"(1.0 / (1.0 + exp(-((w1*x1 + w2*x2) + w3*x3))))"
        ctes.append(
            f"g{i} AS (SELECT round(avg(({p} - y) * x1), 12) AS g1,"
            f" round(avg(({p} - y) * x2), 12) AS g2,"
            f" round(avg(({p} - y) * x3), 12) AS g3"
            f" FROM base, {prev})"
        )
        ctes.append(
            f"w{i} AS (SELECT w1 - {_GD_LR} * g1 AS w1,"
            f" w2 - {_GD_LR} * g2 AS w2, w3 - {_GD_LR} * g3 AS w3"
            f" FROM {prev}, g{i})"
        )
        prev = f"w{i}"
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT round(w1, 6) + 0.0 AS w1, round(w2, 6) + 0.0 AS w2,
           round(w3, 6) + 0.0 AS w3,
           round(avg(CASE WHEN (((w1*x1 + w2*x2) + w3*x3) >= 0)
                               = (y = 1.0)
                          THEN 1.0 ELSE 0.0 END), 6) AS train_acc,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM base, {prev}
    GROUP BY w1, w2, w3
    """
    )


@query("ml_logreg_gd", oracle=_gd_oracle())
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained by batch gradient descent ON THE
    ENGINE: each iteration is one map-side-combinable aggregate producing
    the 3-component gradient as a ONE-ROW table that broadcasts into the
    next iteration — the weights never leave the plan (no .collect(), no
    driver math), which is exactly how iterative-ML-as-dataflow scales:
    per iteration, one pass over the data, 3 doubles of state.

    Determinism: gradients are rounded to 12 decimals per iteration in
    both engines (absorbing exp/reduction-order last-ulp drift before it
    compounds); the final accuracy uses the sign of z, not a sigmoid
    threshold. Oracle = the unrolled CTE chain with identical
    association."""
    orders = io.load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.lit(1.0).alias("x1"),
        (F.col("o_totalprice") / 100000.0).alias("x2"),
        (
            F.substring("o_orderpriority", 1, 1).cast("int") / 5.0
        ).alias("x3"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    w = spark.range(1).select(
        F.lit(0.0).alias("w1"), F.lit(0.0).alias("w2"), F.lit(0.0).alias("w3")
    )
    z = (F.col("w1") * F.col("x1") + F.col("w2") * F.col("x2")) + F.col(
        "w3"
    ) * F.col("x3")
    p = 1.0 / (1.0 + F.exp(-z))
    for _ in range(_GD_ITERS):
        joined = base.crossJoin(F.broadcast(w))
        g = joined.agg(
            F.round(F.avg((p - F.col("y")) * F.col("x1")), 12).alias("g1"),
            F.round(F.avg((p - F.col("y")) * F.col("x2")), 12).alias("g2"),
            F.round(F.avg((p - F.col("y")) * F.col("x3")), 12).alias("g3"),
        )
        w = w.crossJoin(F.broadcast(g)).select(
            (F.col("w1") - _GD_LR * F.col("g1")).alias("w1"),
            (F.col("w2") - _GD_LR * F.col("g2")).alias("w2"),
            (F.col("w3") - _GD_LR * F.col("g3")).alias("w3"),
        )
    correct = F.when(
        (z >= 0) == (F.col("y") == 1.0), 1.0
    ).otherwise(0.0)
    return (
        base.crossJoin(F.broadcast(w))
        .groupBy("w1", "w2", "w3")
        .agg(
            F.round(F.avg(correct), 6).alias("train_acc"),
            F.count("*").alias("n_rows"),
        )
        .select(
            (F.round("w1", 6) + F.lit(0.0)).alias("w1"),
            (F.round("w2", 6) + F.lit(0.0)).alias("w2"),
            (F.round("w3", 6) + F.lit(0.0)).alias("w3"),
            "train_acc",
            F.col("n_rows").cast("bigint").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# emb_pca_power
# --------------------------------------------------------------------------

_PCA_SCALE = 1_000_000  # fixed-point quantizer (6 decimal digits)
_PCA_ITERS = 3
_PCA_DIM = 64


def _pca_oracle() -> str:
    s = _PCA_SCALE
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""lng AS (
            SELECT vec_id, i AS dim, v[i] AS val
            FROM e, unnest(generate_series(1, {_PCA_DIM})) AS r(i)
        )""",
        "mu AS (SELECT dim, avg(val) AS mu FROM lng GROUP BY dim)",
        f"""c AS (
            SELECT vec_id, l.dim,
                   CAST(floor((val - mu.mu) * {s} + 0.5) AS BIGINT) AS c
            FROM lng l JOIN mu ON mu.dim = l.dim
        )""",
        f"""w0 AS (
            SELECT dim,
                   CASE WHEN dim % 2 = 1 THEN {s} ELSE -{s} END AS w
            FROM (SELECT DISTINCT dim FROM c)
        )""",
    ]
    prev = "w0"
    for i in range(1, _PCA_ITERS + 1):
        ctes.append(
            f"""s{i} AS (
            SELECT vec_id,
                   CAST(floor(CAST(CAST(sum(c.c * w.w) AS BIGINT) AS DOUBLE)
                              / {s}.0) AS BIGINT) AS sv
            FROM c JOIN {prev} w ON w.dim = c.dim
            GROUP BY vec_id
        )"""
        )
        ctes.append(
            f"""g{i} AS (
            SELECT c.dim, CAST(sum(s.sv * c.c) AS BIGINT) AS g
            FROM c JOIN s{i} s ON s.vec_id = c.vec_id
            GROUP BY c.dim
        )"""
        )
        ctes.append(
            f"""n{i} AS (
            SELECT sqrt(sum(CAST(g AS DOUBLE) * CAST(g AS DOUBLE))) AS nrm
            FROM g{i}
        )"""
        )
        ctes.append(
            f"""w{i} AS (
            SELECT dim,
                   CAST(floor(CAST(g AS DOUBLE) / nrm * {s} + 0.5) AS BIGINT)
                       AS w
            FROM g{i}, n{i}
        )"""
        )
        prev = f"w{i}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(dim AS INT) AS dim, w / {s}.0 AS loading FROM {prev}
    """
    )


@query("emb_pca_power", oracle=_pca_oracle())
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (centered) embedding cloud by POWER
    ITERATION run entirely in-plan: w <- normalize(C^T (C w)) three
    times, where C is the centered corpus — computed as two keyed
    aggregates per iteration (per-row dot products, then per-dimension
    sums) without ever materializing the 64x64 covariance, the shape that
    scales to any corpus size (state per iteration = one 64-row table).

    Determinism is the graph_pagerank discipline transplanted to linear
    algebra: centered values quantize to BIGINT fixed-point
    (floor(x*1e6 + 0.5) — an explicit quantizer, identical in both
    engines), so every matrix product is an EXACT integer sum under any
    reduction order; doubles appear only at the normalization boundary
    (sqrt + one floor-div whose 1e-6-spaced operands sit far outside any
    rounding ulp). No .collect(): the weight vector flows between
    iterations as a broadcast 64-row table / one-row array column.
    """
    s = _PCA_SCALE
    # slice to the _PCA_DIM-dimension domain the oracle iterates — the
    # registry-wide embedding dim contract (round-5 audit; re-proven on an
    # 80-dim adversarial fixture in round 7, where unsliced posexplode
    # emitted 80 loading rows vs the oracle's 64)
    e = io.load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.slice(F.col("embedding").cast("array<double>"), 1, _PCA_DIM).alias(
            "v"
        ),
    )
    lng = e.select(
        "vec_id", F.posexplode("v").alias("pos", "val")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "val")
    mu = lng.groupBy("dim").agg(F.avg("val").alias("mu"))
    # The centered fixed-point matrix is loop-invariant and read twice per
    # iteration (row-dot side and dimension-sum side): pre-partition by
    # vec_id ONCE and persist, so each iteration's groupBy(vec_id) and
    # join(vec_id) reuse the partitioning instead of re-exploding and
    # re-shuffling the corpus (the graph_pagerank edge-caching discipline).
    c = (
        lng.join(F.broadcast(mu), "dim")
        .select(
            "vec_id",
            "dim",
            F.floor((F.col("val") - F.col("mu")) * s + 0.5)
            .cast("long")
            .alias("c"),
        )
        .repartition(default_parallelism(), "vec_id")
        .persist()
    )
    w = mu.select(
        "dim",
        F.when(F.col("dim") % 2 == 1, s).otherwise(-s).cast("long").alias("w"),
    )
    for _ in range(_PCA_ITERS):
        sv = (
            c.join(F.broadcast(w), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("c") * F.col("w")).alias("dot"))
            .select(
                "vec_id",
                F.floor(F.col("dot").cast("double") / float(s))
                .cast("long")
                .alias("sv"),
            )
        )
        g = (
            c.join(sv, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("sv") * F.col("c")).alias("g"))
        )
        nrm = g.agg(
            F.sqrt(
                F.sum(F.col("g").cast("double") * F.col("g").cast("double"))
            ).alias("nrm")
        )
        w = (
            g.crossJoin(F.broadcast(nrm))
            .select(
                "dim",
                F.floor(F.col("g").cast("double") / F.col("nrm") * s + 0.5)
                .cast("long")
                .alias("w"),
            )
        )
    # the cache stays resident (|rows| x 64 fixed-point longs — a few MB
    # even at sf0.1; unlike graph_pagerank's edge list it is small enough
    # that eager checkpoint-and-release would only hide the plan)
    return w.select(
        F.col("dim").cast("int").alias("dim"),
        (F.col("w") / float(s)).alias("loading"),
    )


# --------------------------------------------------------------------------
# sketch_hll_setops
# --------------------------------------------------------------------------

# Two overlapping partkey sets with a genuinely partial intersection
# (order-keyed predicates are degenerate here — every part appears on
# enough orders that both sets cover the whole universe): A = two thirds
# of parts, B = half of parts, A int B = one third.
_HLL_SET_A = "l_partkey % 3 < 2"
_HLL_SET_B = "l_partkey % 2 = 0"


def _hll_ranked_sql(pred: str, tag: str) -> str:
    """Registers CTE body for one set (same rho machinery as
    sketch_hll_det)."""
    return f"""
        SELECT '{tag}' AS grp,
               CAST(('0x' || substring(hex, 1, 2)) AS BIGINT) AS bucket,
               CASE WHEN stripped = '' THEN {4 * _HLL_RANK_HEX + 1}
                    ELSE 4 * ({_HLL_RANK_HEX} - length(stripped))
                         + CASE WHEN nib = '1' THEN 3
                                WHEN nib IN ('2', '3') THEN 2
                                WHEN nib IN ('4', '5', '6', '7') THEN 1
                                ELSE 0 END
                         + 1 END AS rho
        FROM (
            SELECT hex,
                   regexp_replace(substring(hex, 3, {_HLL_RANK_HEX}), '^0+', '')
                       AS stripped,
                   substring(regexp_replace(
                       substring(hex, 3, {_HLL_RANK_HEX}), '^0+', ''), 1, 1)
                       AS nib
            FROM (SELECT md5(CAST(l_partkey AS VARCHAR)) AS hex
                  FROM lineitem WHERE {pred})
        )
    """


_HLL_RAW_SQL = (
    f"{_HLL_SCALE_SQL} / CAST(sum_scaled"
    f" + ({_HLL_M} - n_present) * 9007199254740992 AS DOUBLE)"
)
# small-range (linear counting) correction, same branch as sketch_hll_det:
# raw <= 2.5m with empty registers -> m * ln(m / V)
_HLL_EST_SQL = (
    f"CASE WHEN {_HLL_RAW_SQL} <= 2.5 * {_HLL_M} AND n_present < {_HLL_M}"
    f" THEN {_HLL_M} * ln({_HLL_M} / CAST({_HLL_M} - n_present AS DOUBLE))"
    f" ELSE {_HLL_RAW_SQL} END"
)


@query(
    "sketch_hll_setops",
    oracle=f"""
    WITH ranked AS (
        {_hll_ranked_sql(_HLL_SET_A, 'A')}
        UNION ALL
        {_hll_ranked_sql(_HLL_SET_B, 'B')}
    ),
    regs AS (
        SELECT grp, bucket, max(rho) AS m_j FROM ranked GROUP BY grp, bucket
    ),
    uregs AS (
        SELECT bucket, max(m_j) AS m_j FROM regs GROUP BY bucket
    ),
    per_set AS (
        SELECT grp,
               sum(CAST(pow(2, 53 - m_j) AS BIGINT)) AS sum_scaled,
               count(*) AS n_present
        FROM regs GROUP BY grp
    ),
    est AS (SELECT grp, {_HLL_EST_SQL} AS e FROM per_set),
    uest AS (
        SELECT {_HLL_EST_SQL} AS e
        FROM (SELECT sum(CAST(pow(2, 53 - m_j) AS BIGINT)) AS sum_scaled,
                     count(*) AS n_present
              FROM uregs)
    ),
    truth AS (
        SELECT
          (SELECT count(DISTINCT l_partkey) FROM lineitem
           WHERE {_HLL_SET_A} OR {_HLL_SET_B}) AS exact_union,
          (SELECT count(*) FROM
            (SELECT DISTINCT l_partkey FROM lineitem WHERE {_HLL_SET_A})
            NATURAL JOIN
            (SELECT DISTINCT l_partkey FROM lineitem WHERE {_HLL_SET_B}))
              AS exact_intersect
    )
    SELECT round(a.e, 4) AS est_a, round(b.e, 4) AS est_b,
           round(u.e, 4) AS est_union,
           round(a.e + b.e - u.e, 4) + 0.0 AS est_intersect,
           CAST(t.exact_union AS BIGINT) AS exact_union,
           CAST(t.exact_intersect AS BIGINT) AS exact_intersect,
           round(abs(u.e - t.exact_union) / t.exact_union, 6)
               AS union_rel_err
    FROM (SELECT e FROM est WHERE grp = 'A') a,
         (SELECT e FROM est WHERE grp = 'B') b,
         uest u, truth t
    """,
)
def sketch_hll_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch ALGEBRA: the union of two sketches is the elementwise
    max of their register tables (exactly the mergeability sketch_hll_det
    relies on, now exercised ACROSS sets), and the intersection estimate
    follows by inclusion-exclusion — the standard audience-overlap /
    cross-segment-cardinality pattern where sketches shine at 100 TB
    (set ops on 256-row states instead of on the raw data). Estimates
    and the measured union error are value-hash-verified; exact truths
    ride along as the quality floor."""
    li = io.load_table(spark, sf_dir, "lineitem")
    hexd = F.md5(F.col("l_partkey").cast("string"))
    bucket, rho = _hll_bucket_rho(hexd)
    sets = [("A", F.expr(_HLL_SET_A)), ("B", F.expr(_HLL_SET_B))]
    ranked = None
    for tag, pred in sets:
        part = li.filter(pred).select(
            F.lit(tag).alias("grp"),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
        ranked = part if ranked is None else ranked.unionAll(part)
    regs = ranked.groupBy("grp", "bucket").agg(F.max("rho").alias("m_j"))
    uregs = regs.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    two53 = 9007199254740992
    scale = (
        F.lit(0.7213 / (1.0 + 1.079 / _HLL_M)) * (_HLL_M * _HLL_M) * float(two53)
    )

    def estimate(reg_df, keys):
        agg = reg_df.groupBy(*keys).agg(
            F.sum(F.pow(F.lit(2.0), 53 - F.col("m_j")).cast("long")).alias(
                "sum_scaled"
            ),
            F.count("*").alias("n_present"),
        )
        raw = scale / (
            F.col("sum_scaled") + (_HLL_M - F.col("n_present")) * F.lit(two53)
        ).cast("double")
        v_empty = _HLL_M - F.col("n_present")
        e = F.when(
            (raw <= 2.5 * _HLL_M) & (v_empty > 0),
            _HLL_M * F.log(_HLL_M / v_empty.cast("double")),
        ).otherwise(raw)
        return agg.select(*keys, e.alias("e"))

    est = estimate(regs, ["grp"])
    uest = estimate(uregs.select(F.lit(1).alias("one"), "m_j"), ["one"]).drop(
        "one"
    )
    a_ids = li.filter(F.expr(_HLL_SET_A)).select("l_partkey").distinct()
    b_ids = li.filter(F.expr(_HLL_SET_B)).select("l_partkey").distinct()
    truth = (
        a_ids.unionAll(b_ids)
        .distinct()
        .agg(F.count("*").alias("exact_union"))
        .crossJoin(
            F.broadcast(
                a_ids.join(b_ids, "l_partkey")
                .agg(F.count("*").alias("exact_intersect"))
            )
        )
    )
    ea = est.filter(F.col("grp") == "A").select(F.col("e").alias("ea"))
    eb = est.filter(F.col("grp") == "B").select(F.col("e").alias("eb"))
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(uest))
        .crossJoin(F.broadcast(truth))
        .select(
            F.round("ea", 4).alias("est_a"),
            F.round("eb", 4).alias("est_b"),
            F.round("e", 4).alias("est_union"),
            (
                F.round(F.col("ea") + F.col("eb") - F.col("e"), 4)
                + F.lit(0.0)
            ).alias("est_intersect"),
            F.col("exact_union").cast("bigint").alias("exact_union"),
            F.col("exact_intersect").cast("bigint").alias("exact_intersect"),
            F.round(
                F.abs(F.col("e") - F.col("exact_union"))
                / F.col("exact_union"),
                6,
            ).alias("union_rel_err"),
        )
    )
