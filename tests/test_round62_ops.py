"""Semantics tests for the round-62 keys (early stopping, RRF,
backlog curve) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_early_stopping_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        d = r.ts.date()
        n, e = daily.get(d, (0, 0))
        daily[d] = (n + 1, e + (r.event_type == "error"))
    days = sorted(daily)
    losses = [
        _trunc_div(2000000 * daily[d][1] + daily[d][0], 2 * daily[d][0])
        for d in days
    ]
    stop_t = None
    for t in range(1, len(days) + 1):
        if t > 3:
            best = min(losses[:t])
            best_before = min(losses[: t - 3])
            if best >= best_before:
                stop_t = t
                break
    horizon = stop_t if stop_t is not None else len(days)
    best_i = min(
        range(horizon), key=lambda i: (losses[i], days[i])
    )
    row = QUERIES["pipeline_early_stopping"](spark, sf_dir).collect()[0]
    assert row.best_day == days[best_i]
    assert row.best_loss_micro == losses[best_i]
    assert row.epochs_run == horizon
    if stop_t is None:
        assert row.stop_day is None
    else:
        assert row.stop_day == days[stop_t - 1]


def test_rank_fusion_matches_python_replay(spark, sf_dir):
    sig = {
        r.doc_id: (r.n_chars, len(set(r.text.split(" "))))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    ra = {
        d: i + 1
        for i, d in enumerate(
            sorted(sig, key=lambda d: (-sig[d][0], d))
        )
    }
    rb = {
        d: i + 1
        for i, d in enumerate(
            sorted(sig, key=lambda d: (-sig[d][1], d))
        )
    }
    rrf = {
        d: _trunc_div(2000000 + 60 + ra[d], 2 * (60 + ra[d]))
        + _trunc_div(2000000 + 60 + rb[d], 2 * (60 + rb[d]))
        for d in sig
    }
    head = sorted(rrf, key=lambda d: (-rrf[d], d))[:10]
    want = {
        (d, ra[d], rb[d], rrf[d], i + 1)
        for i, d in enumerate(head)
    }
    got = {
        (r.doc_id, r.rank_length, r.rank_richness, r.rrf_micro, r.rnk)
        for r in QUERIES["sim_rank_fusion"](spark, sf_dir).collect()
    }
    assert got == want


def test_backlog_curve_matches_python_replay(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_orderdate.date()
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    n_in, n_out = {}, {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        od = orders[r.l_orderkey]
        sd = r.l_shipdate.date()
        n_in[od] = n_in.get(od, 0) + 1
        n_out[sd] = n_out.get(sd, 0) + 1
    days = sorted(set(n_in) | set(n_out))
    backlog = 0
    want = {}
    peak = None
    for d in days:
        i, o = n_in.get(d, 0), n_out.get(d, 0)
        backlog += i - o
        want[d] = (i, o, backlog)
        if peak is None or backlog > want[peak][2]:
            peak = d
    got = {
        r.day: (r.lines_ordered, r.lines_shipped, r.backlog, r.is_peak)
        for r in QUERIES["agg_backlog_curve"](spark, sf_dir).collect()
    }
    assert {d: v[:3] for d, v in got.items()} == want
    for d, (_, _, _, flag) in got.items():
        assert flag == (1 if d == peak else 0)
    # the final backlog is total ordered minus total shipped
    assert got[days[-1]][2] == sum(n_in.values()) - sum(n_out.values())
