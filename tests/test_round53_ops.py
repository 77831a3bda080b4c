"""Semantics tests for the round-53 keys (split leakage, gains
chart, dispersion) — independent Python re-derivations."""

from __future__ import annotations

import hashlib
import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_split_leakage_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    train_g, val = set(), {}
    for r in docs:
        h = int(
            hashlib.md5(f"split-v1{r.doc_id}".encode()).hexdigest()[:8],
            16,
        )
        split = "train" if h % 10 < 8 else "val"
        toks = r.text.split(" ")
        grams = {
            hashlib.md5(
                " ".join(toks[i : i + 5]).encode()
            ).hexdigest()
            for i in range(len(toks) - 4)
        }
        if split == "train":
            train_g |= grams
        elif grams:
            val[r.doc_id] = grams
    n_val = len(val)
    contaminated = sum(1 for g in val.values() if g & train_g)
    leaked = sum(len(g & train_g) for g in val.values())
    total = sum(len(g) for g in val.values())
    row = QUERIES["pipeline_split_leakage"](spark, sf_dir).collect()[0]
    assert (row.n_val_docs, row.n_contaminated) == (n_val, contaminated)
    assert (row.leaked_grams, row.total_grams) == (leaked, total)
    assert row.contamination_micro == _trunc_div(
        2000000 * contaminated + n_val, 2 * n_val
    )


def test_gains_chart_matches_python_replay(spark, sf_dir):
    pts = sorted(
        (
            -math.floor(float(r.value) * 100.0 + 0.5),
            r.event_id,
            1 if r.event_type == "purchase" else 0,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    )
    n = len(pts)
    pos = sum(y for _, _, y in pts)
    got = {
        r.decile: r
        for r in QUERIES["eval_gains_chart"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(1, 11))
    prev = -1
    for d in range(1, 11):
        cut = (d * n + 9) // 10
        cap = sum(y for _, _, y in pts[:cut])
        r = got[d]
        assert r.captured == cap
        assert r.gain_micro == _trunc_div(2000000 * cap + pos, 2 * pos)
        assert r.lift_milli == _trunc_div(
            2 * 10000 * cap + d * pos, 2 * d * pos
        )
        assert r.captured >= prev
        prev = r.captured
    # the full population captures everything: gain = 1, lift = 1x
    assert got[10].gain_micro == 1_000_000
    assert got[10].lift_milli == 1000


def test_dispersion_matches_python_replay(spark, sf_dir):
    hourly = {}
    for r in io.load_events(spark, sf_dir).collect():
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        hourly[h] = hourly.get(h, 0) + 1
    n = len(hourly)
    s = sum(hourly.values())
    ss = sum(c * c for c in hourly.values())
    row = QUERIES["ts_dispersion_test"](spark, sf_dir).collect()[0]
    assert (row.n_hours, row.n_events, row.df) == (n, s, n - 1)
    assert row.vmr_micro == _trunc_div(
        2000000 * (n * ss - s * s) + n * s, 2 * n * s
    )
    assert abs(row.chi2_stat - (n * ss - s * s) / s) < 1e-3
    assert row.vmr_micro > 0
