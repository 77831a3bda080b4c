"""Semantics tests for the round-59 keys (CSV null contract, ATR,
source entropy) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_csv_null_contract_matches_census(spark, sf_dir):
    per = {}
    for r in io.load_events(spark, sf_dir).collect():
        n, nn, s = per.get(r.event_type, (0, 0, 0))
        if r.value is None:
            nn += 1
        else:
            s += math.floor(float(r.value) * 100.0 + 0.5)
        per[r.event_type] = (n + 1, nn, s)
    got = {
        r.event_type: (r.n, r.n_null, r.cents_sum)
        for r in QUERIES["scan_csv_null_contract"](spark, sf_dir).collect()
    }
    assert got == per


def test_atr_matches_python_replay(spark, sf_dir):
    days = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        c = math.floor(float(r.value) * 100.0 + 0.5)
        d = r.ts.date()
        key = (int(r.ts.timestamp() * 1e6), r.event_id)
        h, l, close_key, close = days.get(d, (c, c, key, c))
        h, l = max(h, c), min(l, c)
        if key >= close_key:
            close_key, close = key, c
        days[d] = (h, l, close_key, close)
    order = sorted(days)
    trs = []
    prev_c = None
    for d in order:
        h, l, _, c = days[d]
        if prev_c is None:
            # Wilder's convention: the first day's TR is just H-L
            # (greatest() skips the NULL prev-close in both engines)
            tr = h - l
        else:
            tr = max(h - l, abs(h - prev_c), abs(l - prev_c))
        trs.append((d, tr))
        prev_c = c
    got = {
        r.day: (r.true_range_cents, r.atr_micro)
        for r in QUERIES["win_atr"](spark, sf_dir).collect()
    }
    assert set(got) == {d for d, _ in trs}
    for i, (d, t) in enumerate(trs):
        frame = [t2 for _, t2 in trs[max(0, i - 13) : i + 1]]
        r = got[d]
        assert r[0] == t
        if len(frame) == 14:
            assert r[1] == _trunc_div(
                2000000 * sum(frame) + 100 * 14, 200 * 14
            )
        else:
            assert r[1] is None


def test_source_entropy_matches_python_replay(spark, sf_dir):
    src = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        src[r.source] = src.get(r.source, 0) + 1
    total = sum(src.values())
    h = sum(
        math.floor(
            1e6 * (n / total) * math.log(total / n) + 0.5
        )
        for n in src.values()
    )
    row = QUERIES["corpus_source_entropy"](spark, sf_dir).collect()[0]
    assert (row.n_sources, row.n_docs, row.entropy_micro) == (
        len(src), total, h,
    )
    assert abs(row.effective_sources - math.exp(h / 1e6)) < 1e-3
    # effective sources bounded by actual sources (up to the
    # per-term micro-rounding, which can nudge H past ln(k) by
    # ~|sources| micro-nats)
    assert row.effective_sources <= len(src) * 1.001
