"""Unit tests for the composed operators (operators/ package) and the
observe()-based metrics path."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hh_rumors_presto_spark.operators import (
    asof_join,
    dedup_first_wins,
    forward_fill,
    per_group_top_k,
)
from hh_rumors_presto_spark.operators.paged_source import read_paged


def test_dedup_first_wins_survivor(spark):
    df = spark.createDataFrame(
        [("k1", 1, "a"), ("k1", 2, "b"), ("k2", 3, "c")], ["k", "pos", "v"]
    )
    out = dedup_first_wins(df, F.col("k"), [F.col("pos")]).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {"k1": "a", "k2": "c"}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
def test_dedup_invariants(spark, rows):
    """Property: output keys unique; output is a subset of input; survivor
    is the min-pos row per key (SURVEY.md §5.2)."""
    df = spark.createDataFrame(rows, ["k", "pos"])
    out = dedup_first_wins(df, F.col("k"), [F.col("pos")]).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))
    expect = {}
    for k, pos in rows:
        if k not in expect or pos < expect[k]:
            expect[k] = pos
    assert {r["k"]: r["pos"] for r in out} == expect


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, "x"), (1, 3, None), (1, 4, "y"), (2, 1, None)],
        ["g", "pos", "v"],
    )
    out = forward_fill(df, "v", ["g"], [F.col("pos")], out_col="f").collect()
    got = {(r["g"], r["pos"]): r["f"] for r in out}
    assert got == {
        (1, 1): None,
        (1, 2): "x",
        (1, 3): "x",
        (1, 4): "y",
        (2, 1): None,
    }


def test_per_group_top_k(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 5)], ["g", "v"]
    )
    out = per_group_top_k(df, ["g"], [F.col("v").desc()], k=3).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["v"])
    assert sorted(by_g["a"], reverse=True) == [9, 8, 7]
    assert by_g["b"] == [5]


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, 250, "L2"), (2, 50, "L3")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 90, "A"), (1, 200, "B"), (2, 60, "C")], ["k", "rt", "payload"]
    )
    out = asof_join(
        left, right, key="k", left_ts="t", right_ts="rt",
        payload_cols=["payload"],
    ).collect()
    got = {r["tag"]: r["payload"] for r in out}
    # L1 (t=100): latest right <= 100 is (90, A); L2: (200, B);
    # L3 (t=50): nothing at-or-before -> null (left outer)
    assert got == {"L1": "A", "L2": "B", "L3": None}


def test_paged_source_caps_and_errors(spark):
    pages = {1: 30, 2: 30, 3: 30}

    def fetch(page: int) -> pd.DataFrame:
        if page not in pages:
            return pd.DataFrame({"x": []})
        return pd.DataFrame({"x": range(pages[page])})

    # per-page cap
    out = read_paged(
        spark, fetch, max_pages=10, per_page_limit=20, total_limit=1000,
        schema="x long, page int",
    )
    assert out.count() == 60  # 3 pages x 20 after cap
    # total cap stops pagination early
    out = read_paged(
        spark, fetch, max_pages=10, per_page_limit=30, total_limit=45,
        schema="x long, page int",
    )
    assert out.count() == 45
    # error mid-crawl keeps partial results (reference break-on-error)
    def fetch_err(page: int) -> pd.DataFrame:
        if page == 2:
            raise RuntimeError("boom")
        return pd.DataFrame({"x": range(10)})

    out = read_paged(
        spark, fetch_err, max_pages=10, per_page_limit=30, total_limit=1000,
        schema="x long, page int",
    )
    assert out.count() == 10
    assert out.select("page").distinct().collect()[0][0] == 1


def test_observe_metrics(spark, sf_dir):
    """df.observe metrics surface through the observation API with no extra
    jobs (ref #22 debug counters, production path)."""
    from pyspark.sql import Observation

    from hh_rumors_presto_spark import io

    obs = Observation("stage")
    docs = io.load_table(spark, sf_dir, "documents")
    df = docs.observe(obs, F.count(F.lit(1)).alias("n")).filter(
        F.col("doc_id") % 2 == 0
    )
    df.count()
    assert obs.get["n"] == 500


def test_sessionize_subsecond_gap(spark, tmp_path):
    """A gap of 30min + 0.5s must start a NEW session: the gap compare runs
    at microsecond precision. (A whole-second cast truncates 5400.5s - 3600s
    to exactly 1800s = not > 30min and wrongly merges the sessions.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    sec = 1_000_000_000  # ns
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_id": pa.array([10, 11, 12], pa.int64()),
            # 0s, 1800s (same session: gap exactly 30min), 3600.5s (new:
            # gap 1800.5s; whole-second truncation would see exactly 1800)
            "ts": pa.array([0, 1800 * sec, 3600 * sec + sec // 2], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = QUERIES["ts_sessionize"](spark, str(tmp_path)).collect()
    sessions = {(r.user_id, r.session_no): r.n_events for r in out}
    assert len(sessions) == 2
    assert sessions[(1, 1)] == 2
    assert sessions[(1, 2)] == 1


def test_paged_datasource_filter_pushdown(spark, sf_dir):
    """page predicates pushed via DataSourceReader.pushFilters must prune
    partitions before any fetch; non-page filters come back unsupported."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

    from hh_rumors_presto_spark.sources.paged_datasource import PagedReader

    reader = PagedReader({"path": "unused", "maxPages": "5"})
    leftover = list(
        reader.pushFilters(
            [LessThanOrEqual(("page",), 3), GreaterThan(("page",), 1),
             EqualTo(("doc_id",), 7)]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], EqualTo)
    assert [p.page for p in reader.partitions()] == [2, 3]

    # end-to-end: the pruned scan returns exactly pages <= 2
    from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

    load_all_queries()
    out = QUERIES["scan_paged_pushdown"](spark, sf_dir)
    pages = sorted({r.page for r in out.select("page").distinct().collect()})
    assert pages == [1, 2]


def test_bucketed_rank_cumsum_matches_global_window(spark):
    """The bucketed two-pass cumsum (round-10 exemplar operator) is
    bit-identical to the single-partition `row_number + running sum`
    form — including duplicate keys, negative keys, and a constant
    column (hi == lo puts every row in bucket 0)."""
    from pyspark.sql import Window

    from hh_rumors_presto_spark.operators.windows import (
        bucketed_rank_cumsum,
    )

    rows = [
        (i, v)
        for i, v in enumerate(
            [5, -3, 5, 0, 12, -3, 7, 7, 7, 1, 0, 99, -50, 12, 3]
        )
    ]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: (r.rk, r.cum, r.n, r.total)
        for r in bucketed_rank_cumsum(
            df, order_key="v", tiebreak="id", value_col="v", n_buckets=4
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: (r.rk, r.cum, r.n, r.total)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rk"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
            F.count("*").over(Window.partitionBy()).alias("n"),
            F.sum("v").over(Window.partitionBy()).alias("total"),
        ).collect()
    }
    assert got == want
    # constant key: every row lands in bucket 0, ranks still exact
    cdf = spark.createDataFrame([(i, 7) for i in range(6)], "id long, v long")
    ranks = sorted(
        r.rk
        for r in bucketed_rank_cumsum(
            cdf, order_key="v", tiebreak="id", value_col="v"
        ).collect()
    )
    assert ranks == [1, 2, 3, 4, 5, 6]


def test_ntile_from_rank_matches_native_ntile(spark):
    """ntile_from_rank's closed form == SQL-standard NTILE for every
    n in 1..25 x k in {2,3,5,7} (covers n < k, n % k == 0, and every
    remainder class) — the guarantee feat_rfm_segmentation's
    quintiles rely on after the round-10 bucketed conversion."""
    from pyspark.sql import Window

    from hh_rumors_presto_spark.operators.windows import ntile_from_rank

    for k in (2, 3, 5, 7):
        for n in range(1, 26):
            df = spark.range(1, n + 1).select(
                F.col("id").alias("rk"), F.lit(n).cast("long").alias("n")
            )
            got = {
                r.rk: r.t
                for r in df.select(
                    "rk", ntile_from_rank(F.col("rk"), F.col("n"), k).alias("t")
                ).collect()
            }
            want = {
                r.rk: r.t
                for r in spark.range(1, n + 1)
                .select(
                    F.col("id").alias("rk"),
                    F.ntile(k).over(Window.orderBy("id")).alias("t"),
                )
                .collect()
            }
            assert got == want, (k, n)


def test_bucketed_rank_cumsum_full_long_domain_keys(spark):
    """Keys spanning nearly the full LONG domain: the old LONG bucket
    map overflowed on (key-lo)*B and silently broke bucket monotonicity
    (ADVICE r10 low); the DECIMAL(38,0) map stays exact. Ranks must
    match the global-window formulation bit-for-bit."""
    from pyspark.sql import Window

    from hh_rumors_presto_spark.operators.windows import (
        bucketed_rank_cumsum,
    )

    big = 2**62
    vals = [-big, -big + 3, -17, 0, 5, big - 9, big, 42, -big + 1]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: (r.rk, r.n)
        for r in bucketed_rank_cumsum(
            df, order_key="v", tiebreak="id", value_col=None, n_buckets=8
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: (r.rk, r.n)
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        ).collect()
    }
    assert got == want
