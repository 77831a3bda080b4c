"""Semantics tests for the round-32 classifier-diagnostics keys
(ECE, F1 sweep, kappa) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _pts(spark, sf_dir):
    return [
        (
            math.floor(float(r.value) * 100.0 + 0.5),
            1 if r.event_type == "purchase" else 0,
            r.event_id,
        )
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None and r.event_type in ("purchase", "view")
    ]


def test_calibration_ece_matches_python_replay(spark, sf_dir):
    pts = _pts(spark, sf_dir)
    bins = {}
    for c, y, _ in pts:
        pct = c % 100
        b = pct // 10
        n, cs, pos = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, cs + pct, pos + y)
    gap_total = sum(abs(cs - 100 * pos) for _, cs, pos in bins.values())
    n_total = sum(n for n, _, _ in bins.values())
    ece = gap_total / (100.0 * n_total)
    rows = {
        r.bin: r
        for r in QUERIES["eval_calibration_ece"](spark, sf_dir).collect()
    }
    assert set(rows) == set(bins)
    for b, (n, cs, pos) in bins.items():
        r = rows[b]
        assert r.n == n
        assert abs(r.mean_conf - cs / (100.0 * n)) < 1e-5
        assert abs(r.observed - pos / n) < 1e-5
        assert r.gap_num == abs(cs - 100 * pos)
        assert abs(r.ece - ece) < 1e-5


def test_f1_threshold_matches_python_replay(spark, sf_dir):
    pts = sorted(_pts(spark, sf_dir), key=lambda t: (t[0], t[2]))
    n = len(pts)
    rows = {
        r.quartile: r
        for r in QUERIES["eval_f1_threshold"](spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 3}
    for q in (1, 2, 3):
        thr = pts[(q * n + 3) // 4 - 1][0]
        tp = sum(1 for s, y, _ in pts if s >= thr and y == 1)
        fp = sum(1 for s, y, _ in pts if s >= thr and y == 0)
        fn = sum(1 for s, y, _ in pts if s < thr and y == 1)
        tn = sum(1 for s, y, _ in pts if s < thr and y == 0)
        r = rows[q]
        assert (r.threshold_cents, r.tp, r.fp, r.fn, r.tn) == (
            thr, tp, fp, fn, tn,
        )
        assert r.precision_micro == (2000000 * tp + tp + fp) // (
            2 * (tp + fp)
        )
        assert r.recall_micro == (2000000 * tp + tp + fn) // (
            2 * (tp + fn)
        )
        f1d = 2 * tp + fp + fn
        assert r.f1_micro == (4000000 * tp + f1d) // (2 * f1d)
        # F1 is the harmonic mean: between min(P,R) and max(P,R)
        assert (
            min(r.precision_micro, r.recall_micro) - 1
            <= r.f1_micro
            <= max(r.precision_micro, r.recall_micro) + 1
        )
    # lower threshold => recall can only be >= (monotone sweep)
    assert rows[1].recall_micro >= rows[2].recall_micro >= rows[3].recall_micro


def test_cohens_kappa_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    a11 = a10 = a01 = a00 = 0
    for r in docs:
        ra = 1 if r.n_chars >= 300 else 0
        rb = 1 if len(r.text.split(" ")) >= 50 else 0
        if ra and rb:
            a11 += 1
        elif ra:
            a10 += 1
        elif rb:
            a01 += 1
        else:
            a00 += 1
    n = len(docs)
    pe_num = (a11 + a10) * (a11 + a01) + (a01 + a00) * (a10 + a00)
    kappa = (n * (a11 + a00) - pe_num) / (n * n - pe_num)
    row = QUERIES["eval_cohens_kappa"](spark, sf_dir).collect()[0]
    assert (
        row.n, row.both_good, row.a_only, row.b_only, row.both_bad
    ) == (n, a11, a10, a01, a00)
    assert abs(row.kappa - kappa) < 1e-5
    assert -1.0 <= row.kappa <= 1.0
