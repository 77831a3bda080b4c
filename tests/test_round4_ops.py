"""Semantic cross-checks for the round-4 operators, independent of the
DuckDB oracles: each scalable implementation is compared against a
brute-force reference computed in plain Python on the same fixture rows.
"""

from __future__ import annotations

import math

import pytest

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_spatial_grid_matches_bruteforce(spark, sf_dir):
    """The banded 3x3-cell join must find EXACTLY the pairs brute force
    finds — bucketing is an optimization, never a semantics change."""
    rows = QUERIES["join_spatial_grid"](spark, sf_dir).collect()
    got = {(r.a_id, r.b_id): r.dist_sq for r in rows}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ids = [r.event_id for r in ev.select("event_id").collect() if r.event_id % 2 == 0]
    pts = {
        e: (((e * e) // 7 + e * 101) % 1000, ((e * e) // 11 + e * 17) % 1000)
        for e in ids
    }
    want = {}
    items = sorted(pts.items())
    for i, (ea, (xa, ya)) in enumerate(items):
        for eb, (xb, yb) in items[i + 1 :]:
            d = (xa - xb) ** 2 + (ya - yb) ** 2
            if d <= 25:
                want[(ea, eb)] = d
    assert got == want
    assert want, "fixture produced no pairs — test is vacuous"


def test_ewma_matches_direct_definition(spark, sf_dir):
    """Unrolled lag-chain EWMA == direct weighted mean over the trailing
    8 observations, for every row of one user's ordered series."""
    out = {
        (r.user_id, r.event_id): r.ewma
        for r in QUERIES["ts_ewma"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = sorted(
        ev.select("user_id", "event_id", "ts", "value").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for user, series in by_user.items():
        for t, r in enumerate(series):
            window = series[max(0, t - 7) : t + 1][::-1]  # newest first
            num = sum(0.5**i * x.value for i, x in enumerate(window))
            den = sum(0.5**i for i in range(len(window)))
            assert out[(user, r.event_id)] == pytest.approx(num / den, rel=1e-12)
            checked += 1
    assert checked > 0


def test_phash_dedup_matches_banded_bruteforce(spark, sf_dir):
    """Pair set == brute-force over the same signatures: a pair qualifies
    iff it shares >= 1 of the 4 bands AND hamming <= 6. Also asserts the
    fixture genuinely produces near-dup (0 < ham) pairs, not just exact
    copies."""
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in QUERIES["mm_phash_dedup"](spark, sf_dir).collect()
    }
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = {}
    for r in docs.select("doc_id").collect():
        h = hashlib.md5(f"img{r.doc_id % 120}".encode()).hexdigest()[:15]
        mask = (1 << min(r.doc_id // 120, 50)) - 1
        sigs[r.doc_id] = int(h, 16) ^ mask
    want = {}
    items = sorted(sigs.items())
    for i, (a, sa) in enumerate(items):
        for b, sb in items[i + 1 :]:
            shares_band = any(
                (sa >> (15 * k)) & 32767 == (sb >> (15 * k)) & 32767
                for k in range(4)
            )
            ham = bin(sa ^ sb).count("1")
            if shares_band and ham <= 6:
                want[(a, b)] = ham
    assert got == want
    assert any(h > 0 for h in want.values()), "no true NEAR-dups exercised"


def test_pq_assign_code_is_argmin(spark, sf_dir):
    """pq_code unpacks to the true per-subspace argmin centroid and q_err
    to the true total reconstruction error (brute force per vector)."""
    out = {
        r.vec_id: (r.pq_code, r.q_err)
        for r in QUERIES["sim_pq_assign"](spark, sf_dir).collect()
    }
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for r in emb.collect():
        q = [math.floor(float(v) * 1000) for v in r.embedding]
        code, err = 0, 0
        for s in range(4):
            dists = []
            for c in range(4):
                d = sum(
                    (q[16 * s + j] - (((s * 131 + c * 37 + j * 17) % 1000) - 500))
                    ** 2
                    for j in range(16)
                )
                dists.append((d, c))
            d, c = min(dists)
            code += c * (1 << (2 * s))
            err += d
        assert out[r.vec_id] == (code, err)


def test_skyline_is_exactly_the_pareto_frontier(spark, sf_dir):
    """Survivors are all and only the non-dominated docs per language."""
    kept = {
        r.doc_id for r in QUERIES["curation_skyline"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = [
        (r.doc_id, r.lang, len(set(r.text.split(" "))), len(r.text))
        for r in docs.select("doc_id", "lang", "text").collect()
    ]
    want = set()
    for did, lang, u, n in m:
        dominated = any(
            bl == lang
            and bu >= u
            and bn <= n
            and (bu > u or bn < n)
            for bd, bl, bu, bn in m
            if bd != did
        )
        if not dominated:
            want.add(did)
    assert kept == want


def test_multires_rollup_merge_equals_recompute(spark, sf_dir):
    """The daily level (merged from hourly partials) must equal a direct
    day-level aggregation of the raw events."""
    from pyspark.sql import functions as F

    out = QUERIES["ts_multires_rollup"](spark, sf_dir)
    daily = {
        (r.event_type, r.bucket): (r.n, r.total)
        for r in out.filter(F.col("resolution") == "1d").collect()
    }
    from hh_rumors_presto_spark import io

    ev = io.load_events(spark, sf_dir)
    direct = {
        (r.event_type, r.bucket): (r.n, r.total)
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert daily == direct


def test_ivfpq_neighbors_come_from_query_cell(spark, sf_dir):
    """Every returned neighbor must share the query's coarse cell, ranks
    must be exact-distance-ordered, and result sets non-empty."""
    rows = QUERIES["sim_ivfpq_search"](spark, sf_dir).collect()
    assert rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cells = {}
    for r in emb.collect():
        q = [math.floor(float(v) * 1000) for v in r.embedding]
        best = min(
            (
                sum(
                    (q[j] - (((k * 257 + j * 41) % 1000) - 500)) ** 2
                    for j in range(64)
                )
                * 8
                + k,
                k,
            )
            for k in range(8)
        )
        cells[r.vec_id] = best[1]
    by_query: dict = {}
    for r in rows:
        assert cells[r.neighbor_id] == cells[r.query_id]
        by_query.setdefault(r.query_id, []).append(r.dist)
    for dists in by_query.values():
        assert dists == sorted(dists)


# ---------------------------------------------------------------------------
# property-based: the generic skyline operator vs brute force

from hypothesis import given, settings
from hypothesis import strategies as st

_pts = st.lists(
    st.tuples(
        st.sampled_from(["p", "q"]),              # partition
        st.integers(min_value=0, max_value=6),    # maximize axis
        st.integers(min_value=0, max_value=6),    # minimize axis
    ),
    min_size=1,
    max_size=18,
)


@settings(max_examples=20, deadline=None)
@given(_pts)
def test_skyline_operator_matches_bruteforce(spark, rows):
    """Random small instances, including metric ties and duplicate rows:
    the two-stage keyed plan must equal the O(n^2) dominance definition."""
    from hh_rumors_presto_spark.operators import skyline_2d

    data = [(i, p, mx, mn) for i, (p, mx, mn) in enumerate(rows)]
    df = spark.createDataFrame(data, ["rid", "part", "mx", "mn"])
    got = {r.rid for r in skyline_2d(df, ["part"], "mx", "mn").collect()}
    want = set()
    for rid, p, mx, mn in data:
        dominated = any(
            p2 == p and mx2 >= mx and mn2 <= mn and (mx2 > mx or mn2 < mn)
            for rid2, p2, mx2, mn2 in data
            if rid2 != rid
        )
        if not dominated:
            want.add(rid)
    assert got == want


# property-based: asof_join and forward_fill vs brute force

_series = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),              # key
        st.integers(min_value=0, max_value=30),   # ts
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(_series, _series)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    """Random series with duplicate timestamps: asof picks the latest
    right row at-or-before each left row, ties broken by the tiebreak
    column; unmatched left rows keep null."""
    from hh_rumors_presto_spark.operators import asof_join

    ldata = [(i, k, t) for i, (k, t) in enumerate(lrows)]
    rdata = [(i, k, t, f"v{i}") for i, (k, t) in enumerate(rrows)]
    left = spark.createDataFrame(ldata, ["lid", "key", "ts"])
    right = spark.createDataFrame(rdata, ["rid", "key", "rts", "val"])
    out = {
        r.lid: r.val
        for r in asof_join(
            left,
            right,
            key="key",
            left_ts="ts",
            right_ts="rts",
            payload_cols=["val"],
            right_tiebreak="rid",
        ).collect()
    }
    for lid, k, t in ldata:
        cands = [(rt, rid, v) for rid, rk, rt, v in rdata if rk == k and rt <= t]
        want = max(cands)[2] if cands else None
        assert out[lid] == want, (lid, k, t)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_forward_fill_matches_bruteforce(spark, rows):
    """LOCF over random null patterns equals a sequential scan."""
    from hh_rumors_presto_spark.operators import forward_fill
    from pyspark.sql import functions as F

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    # explicit schema: an all-null value column defeats type inference
    df = spark.createDataFrame(
        data, "pos LONG, key STRING, v LONG"
    )
    out = {
        r.pos: r.filled
        for r in forward_fill(
            df, "v", ["key"], [F.col("pos")], out_col="filled"
        ).collect()
    }
    last: dict = {}
    for pos, k, v in data:
        if v is not None:
            last[k] = v
        assert out[pos] == last.get(k), (pos, k)


def test_hist_quantile_within_one_bucket_of_exact(spark, sf_dir):
    """The histogram sketch's p50/p90/p99 estimates must land within one
    bucket width ($1000) of the exact rank statistic, and the rank must
    equal the integer ceil of pct*N."""
    rows = {
        r.pct: (r.rank, r.est)
        for r in QUERIES["sketch_hist_quantile"](spark, sf_dir).collect()
    }
    assert set(rows) == {50, 90, 99}
    prices = sorted(
        round(r.o_totalprice, 2)
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    n = len(prices)
    for pct, (rank, est) in rows.items():
        want_rank = -((-pct * n) // 100)  # ceil(pct*n/100) in integers
        assert rank == want_rank
        exact = prices[rank - 1]  # rank-th smallest
        assert abs(est - exact) <= 1000.0, (pct, est, exact)
