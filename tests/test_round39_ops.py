"""Semantics tests for the round-39 keys (multiclass confusion,
file sizing, runs test) — independent Python re-derivations."""

from __future__ import annotations

import math

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _router(cents):
    if cents < 2000:
        return "view"
    if cents < 4000:
        return "click"
    if cents < 6000:
        return "signup"
    if cents < 8000:
        return "purchase"
    return "error"


def test_confusion_multiclass_matches_python_replay(spark, sf_dir):
    pts = [
        (r.event_type, _router(math.floor(float(r.value) * 100.0 + 0.5)))
        for r in io.load_events(spark, sf_dir).collect()
        if r.value is not None
    ]
    classes = {a for a, _ in pts}
    per = {}
    for cls in classes:
        tp = sum(1 for a, p in pts if a == cls and p == cls)
        fp = sum(1 for a, p in pts if a != cls and p == cls)
        fn = sum(1 for a, p in pts if a == cls and p != cls)
        ratio = lambda num, den: (
            0 if den == 0 else (2000000 * num + den) // (2 * den)
        )
        per[cls] = (
            tp, fp, fn,
            ratio(tp, tp + fp),
            ratio(tp, tp + fn),
            ratio(2 * tp, 2 * tp + fp + fn),
        )
    f1s = [v[5] for v in per.values()]
    macro = (2 * sum(f1s) + len(f1s)) // (2 * len(f1s))
    rows = {
        r.cls: r
        for r in QUERIES["eval_confusion_multiclass"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == classes
    for cls, (tp, fp, fn, pm, rm, fm) in per.items():
        r = rows[cls]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn)
        assert (r.prec_micro, r.rec_micro, r.f1_micro) == (pm, rm, fm)
        assert r.macro_f1_micro == macro


def test_file_sizing_contract(spark, sf_dir):
    counts = {}
    for r in io.load_events(spark, sf_dir).collect():
        counts[r.event_type] = counts.get(r.event_type, 0) + 1
    rows = {
        r.event_type: r
        for r in QUERIES["sink_file_sizing"](spark, sf_dir).collect()
    }
    assert set(rows) == set(counts)
    for et, n in counts.items():
        r = rows[et]
        assert r.n_rows == n
        assert r.n_files == (n + 499) // 500
        assert r.max_file_rows == min(n, 500)


def test_runs_test_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    days = sorted(daily)
    signs = []
    for i in range(1, len(days)):
        d = daily[days[i]] - daily[days[i - 1]]
        if d != 0:
            signs.append(1 if d > 0 else -1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(
        1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
    )
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (((n1 + n2) ** 2) * (n1 + n2 - 1))
    )
    row = QUERIES["agg_runs_test"](spark, sf_dir).collect()[0]
    assert (row.n_plus, row.n_minus, row.n_runs) == (n1, n2, runs)
    assert abs(row.z - (runs - mu) / math.sqrt(var)) < 1e-5
