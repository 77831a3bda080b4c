"""Round-4 analytics batch: exact EWMA smoothing, grid-bucketed spatial
radius join, perceptual-hash near-dup over binary image signatures, and
product-quantization encoding for the ANN scale path.

Determinism policy (registry.py rules): every key below is bit-exact
across engines — EWMA multiplies by powers of two only (exponent shifts,
no mantissa rounding) with identical addition order in both SQL texts;
the other three work entirely in BIGINT after a floor() quantization.

Scale notes (100 TB posture):
- ``ts_ewma`` is one keyed window (shuffle on user_id); constant state
  per row (8 lags), no unbounded frames.
- ``join_spatial_grid`` is the canonical bounded spatial join: cell size
  = radius, so candidates live in the 3x3 neighborhood; the build side
  fans out x9 and the probe side shuffles once on the cell key. Pair
  cost is sum(occupancy^2) over cells, never n^2; skewed cells are
  AQE-splittable because the join is a plain equi-join.
- ``mm_phash_dedup`` is LSH for images: 60-bit signature, 4 bands x 15
  bits, candidates only within a shared band bucket (same posture as
  dedup_minhash; no pair is formed outside a bucket).
- ``sim_pq_assign`` runs shuffle-free: quantize -> per-subspace distances
  via transform/aggregate higher-order functions -> argmin packed as
  min(d*4+c) -- all whole-stage codegen, zero exchanges (plan-gated).
  This is the PQ-encode stage an IVF-PQ index builds on: 64 floats
  compress to one 8-bit code (4 subspaces x 2 bits here; widths are
  literals a deployment tunes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import query

# ---------------------------------------------------------------------------
# ts_ewma

_EWMA_WEIGHTS = [0.5**i for i in range(1, 8)]  # exact binary fractions


@query(
    "ts_ewma",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, value,
               lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
               lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
               lag(value, 5) OVER w AS l5, lag(value, 6) OVER w AS l6,
               lag(value, 7) OVER w AS l7
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id, event_id,
           (value
            + coalesce(l1, 0) * 0.5 + coalesce(l2, 0) * 0.25
            + coalesce(l3, 0) * 0.125 + coalesce(l4, 0) * 0.0625
            + coalesce(l5, 0) * 0.03125 + coalesce(l6, 0) * 0.015625
            + coalesce(l7, 0) * 0.0078125)
           /
           (1.0
            + (CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END)
            + (CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END)
            + (CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END)
            + (CASE WHEN l4 IS NULL THEN 0 ELSE 0.0625 END)
            + (CASE WHEN l5 IS NULL THEN 0 ELSE 0.03125 END)
            + (CASE WHEN l6 IS NULL THEN 0 ELSE 0.015625 END)
            + (CASE WHEN l7 IS NULL THEN 0 ELSE 0.0078125 END))
           AS ewma
    FROM ev
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (decay 1/2, depth 8) per
    user. The recursive EWMA definition is unrolled to a fixed lag chain
    so each row is a pure expression over a constant number of window
    lags — no stateful scan, no unbounded frame; the warmup rows
    renormalize by the weight mass actually available.

    Bit-exact: weights are powers of two (multiplication only shifts the
    exponent) and both engines add the terms in the same textual order."""
    ev = io.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = {i: F.lag("value", i).over(w) for i in range(1, 8)}
    num = F.col("value")
    den = F.lit(1.0)
    for i, wt in enumerate(_EWMA_WEIGHTS, start=1):
        num = num + F.coalesce(lags[i], F.lit(0.0)) * F.lit(wt)
        den = den + F.when(lags[i].isNull(), 0.0).otherwise(wt)
    return ev.select(
        "user_id", "event_id", (num / den).alias("ewma")
    )


# ---------------------------------------------------------------------------
# join_spatial_grid

_GRID_PTS_SQL = """
    pts AS (
        SELECT event_id AS id,
               ((event_id * event_id) // 7 + event_id * 101) % 1000 AS x,
               ((event_id * event_id) // 11 + event_id * 17) % 1000 AS y,
               (((event_id * event_id) // 7 + event_id * 101) % 1000) // 5 AS cx,
               (((event_id * event_id) // 11 + event_id * 17) % 1000) // 5 AS cy
        FROM events WHERE event_id % 2 = 0
    )
"""


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH {_GRID_PTS_SQL}
    SELECT a.id AS a_id, b.id AS b_id,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
    FROM pts a
    CROSS JOIN (VALUES (-1), (0), (1)) dxs(dx)
    CROSS JOIN (VALUES (-1), (0), (1)) dys(dy)
    JOIN pts b ON b.cx = a.cx + dxs.dx AND b.cy = a.cy + dys.dy
              AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 25
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within Euclidean radius 5 on a 1000x1000 integer
    grid (points derived deterministically from event ids), found via
    grid-cell bucketing: cell size = radius, so every qualifying pair
    shares a 3x3 cell neighborhood and the candidate join is a plain
    equi-join on (cell_x, cell_y). Each unordered pair is emitted exactly
    once (the probe point's single home cell matches exactly one of the
    build point's nine offsets; id< orders the pair).

    Scale: candidate cost is sum over cells of occupancy^2 — bounded by
    density, never n^2; all-integer distance math, bit-exact."""
    ev = io.load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 2 == 0
    )
    eid = F.col("event_id")
    # id -> coordinate uses an integer-division term: any pure polynomial
    # mod 1000 is periodic in (id mod 1000) and folds the ids onto a few
    # hundred lattice points; (id^2 DIV k) breaks that periodicity.
    pts = ev.select(
        eid.alias("id"),
        ((F.expr("(event_id * event_id) DIV 7") + eid * 101) % 1000).alias("x"),
        ((F.expr("(event_id * event_id) DIV 11") + eid * 17) % 1000).alias("y"),
    ).withColumns(
        {"cx": F.expr("x DIV 5"), "cy": F.expr("y DIV 5")}
    )
    three = F.array(F.lit(-1), F.lit(0), F.lit(1))
    a = (
        pts.withColumn("dx", F.explode(three))
        .withColumn("dy", F.explode(three))
        .select(
            F.col("id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    b = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist_sq = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist_sq <= 25)
        .select("a_id", "b_id", dist_sq.alias("dist_sq"))
    )


# ---------------------------------------------------------------------------
# mm_phash_dedup

_PHASH_SIGS_SQL = """
    sigs AS (
        SELECT doc_id,
               xor(CAST('0x' || substring(md5('img' || CAST(doc_id % 120 AS VARCHAR)), 1, 15) AS BIGINT),
                   (CAST(1 AS BIGINT) << least(doc_id // 120, 50)) - 1) AS sig
        FROM documents
    )
"""


@query(
    "mm_phash_dedup",
    oracle=f"""
    WITH {_PHASH_SIGS_SQL},
    bands AS (
        SELECT doc_id, sig, b.b AS b, (sig >> (15 * b.b)) & 32767 AS bv
        FROM sigs CROSS JOIN (VALUES (0), (1), (2), (3)) b(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
               a.sig AS sa, b.sig AS sb
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 6
    """,
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for image-like payloads:
    each document carries a 60-bit signature (stand-in for an 8x8
    average-hash over decoded pixels — the container ships no codecs, so
    the signature derives deterministically from the payload id, with
    controlled low-bit perturbations to create genuine near-dup groups).
    Candidates come ONLY from shared 15-bit band buckets (4 bands, the
    minhash-LSH posture); survivors are pairs at Hamming distance <= 6.

    Scale: banding bounds the pair space to same-bucket members; the
    Hamming filter is two integer instructions (xor + popcount) — this is
    the standard image-dedup shape at corpus scale."""
    docs = io.load_table(spark, sf_dir, "documents")
    sigs = docs.select(
        "doc_id",
        F.expr(
            "conv(substring(md5(concat('img', CAST(doc_id % 120 AS STRING))), 1, 15), 16, 10)"
        )
        .cast("long")
        .bitwiseXOR(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(least(doc_id div 120, 50) AS INT)) - 1"
            )
        )
        .alias("sig"),
    )
    band_vals = F.array(
        *[F.expr(f"shiftright(sig, {15 * b}) & 32767") for b in range(4)]
    )
    bands = sigs.select(
        "doc_id", "sig", F.posexplode(band_vals).alias("b", "bv")
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("sa"), "b", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("sb"), "b", "bv"
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
    return (
        a.join(b, ["b", "bv"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "sa", "sb")
        .distinct()
        .filter(ham <= 6)
        .select("a_id", "b_id", ham.alias("hamming"))
    )


# ---------------------------------------------------------------------------
# sim_pq_assign

_PQ_SUBSPACES = 4
_PQ_CODEBOOK = 4  # centroids per subspace
_PQ_SUBDIM = 16


def _pq_cen_sql(s: int, c: int) -> str:
    """Centroid value formula (scaled x1000 integer domain), jj 0-based."""
    return f"((({s} * 131 + {c} * 37 + jj * 17) % 1000) - 500)"


@query(
    "sim_pq_assign",
    oracle=f"""
    WITH xq AS (
        SELECT vec_id, t.j AS j,
               CAST(floor(CAST(embedding[CAST(t.j AS INT) + 1] AS DOUBLE) * 1000)
                    AS BIGINT) AS q,
               t.j // {_PQ_SUBDIM} AS s, t.j % {_PQ_SUBDIM} AS jj
        FROM embeddings, range(0, {_PQ_SUBSPACES * _PQ_SUBDIM}) t(j)
    ),
    dist AS (
        SELECT vec_id, s, cs.c AS c,
               sum((q - (((s * 131 + cs.c * 37 + jj * 17) % 1000) - 500))
                   * (q - (((s * 131 + cs.c * 37 + jj * 17) % 1000) - 500))) AS d
        FROM xq CROSS JOIN (VALUES (0), (1), (2), (3)) cs(c)
        GROUP BY vec_id, s, cs.c
    ),
    best AS (
        SELECT vec_id, s, min(d * 4 + c) AS k FROM dist GROUP BY vec_id, s
    )
    SELECT vec_id,
           CAST(sum((k % 4) * (CAST(1 AS BIGINT) << CAST(2 * s AS INT))) AS BIGINT)
               AS pq_code,
           CAST(sum(k // 4) AS BIGINT) AS q_err
    FROM best GROUP BY vec_id
    """,
)
def sim_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode: the 64-dim embedding splits into 4
    subspaces of 16 dims; each subspace snaps to its nearest of 4
    deterministic codebook centroids (formula-derived, so both engines
    share the codebook without literals); the 4 two-bit codes pack into
    one byte plus the total squared reconstruction error. Vectors
    quantize to integers (floor(x*1000)) first, so every distance is
    exact BIGINT math — the argmin is tie-stable by construction
    (min over d*4+c packs the centroid index as the tiebreak).

    Scale: the Spark plan is SHUFFLE-FREE — slices, per-element centroid
    distances, and the packed argmin all run as transform/aggregate
    higher-order expressions inside whole-stage codegen, one narrow map
    over the corpus (the oracle's explode+regroup form is the same math,
    written for DuckDB's benefit). PQ-encode is the corpus-side build
    stage of an IVF-PQ ANN index: 256 bytes of float32 become 1 byte."""
    emb = io.load_table(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * F.lit(1000.0)).cast("long"),
    )
    vecs = emb.select("vec_id", qarr.alias("q"))

    def subspace_dist(s: int, c: int):
        sl = F.slice("q", _PQ_SUBDIM * s + 1, _PQ_SUBDIM)
        diffs = F.transform(
            sl,
            lambda x, i: (
                x
                - (
                    (F.lit(s * 131 + c * 37) + i * 17) % 1000 - 500
                )
            ),
        )
        return F.aggregate(
            F.transform(diffs, lambda d: d * d),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    packed = []
    for s in range(_PQ_SUBSPACES):
        keys = [
            subspace_dist(s, c) * 4 + F.lit(c) for c in range(_PQ_CODEBOOK)
        ]
        packed.append(F.least(*keys).alias(f"k{s}"))
    with_keys = vecs.select("vec_id", *packed)
    code = sum(
        ((F.col(f"k{s}") % 4) * F.lit(1 << (2 * s))) for s in range(_PQ_SUBSPACES)
    )
    err = sum(
        F.expr(f"k{s} DIV 4") for s in range(_PQ_SUBSPACES)
    )
    return with_keys.select(
        "vec_id",
        code.cast("long").alias("pq_code"),
        err.cast("long").alias("q_err"),
    )
