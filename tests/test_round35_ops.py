"""Semantics tests for the round-35 keys (bitmap segments, cohort
LTV, temperature mix) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_bitmap_segments_match_set_semantics(spark, sf_dir):
    """The bitmap algebra must equal plain set algebra over users."""
    segs = {"purchase": set(), "view": set(), "error": set()}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type in segs:
            segs[r.event_type].add(r.user_id)
    p, v, e = segs["purchase"], segs["view"], segs["error"]
    words = {u // 63 for u in p | v | e}
    row = QUERIES["agg_bitmap_segments"](spark, sf_dir).collect()[0]
    assert row.n_words == len(words)
    assert row.purchasers == len(p)
    assert row.viewers == len(v)
    assert row.purch_and_view == len(p & v)
    assert row.any_segment == len(p | v | e)
    assert row.engaged_clean == len((p & v) - e)
    assert row.window_shoppers == len(v - p)


def test_cohort_ltv_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    ev = io.load_events(spark, sf_dir).collect()
    week = lambda d: (d - epoch).days // 7
    signup = {}
    for r in ev:
        w = week(r.ts.date())
        signup[r.user_id] = min(signup.get(r.user_id, w), w)
    csize = {}
    for c in signup.values():
        csize[c] = csize.get(c, 0) + 1
    rev = {}
    for r in ev:
        if r.event_type != "purchase" or r.value is None:
            continue
        c = signup[r.user_id]
        age = week(r.ts.date()) - c
        rev[(c, age)] = rev.get((c, age), 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    want = {}
    for c in {k[0] for k in rev}:
        ages = sorted(a for cc, a in rev if cc == c)
        cum = 0
        for a in ages:
            cum += rev[(c, a)]
            want[(c, a)] = (csize[c], cum)
    got = {
        (r.cohort_week_idx, r.age_weeks): (
            r.cohort_size,
            r.cum_rev_cents,
            r.ltv_per_user,
        )
        for r in QUERIES["agg_cohort_ltv"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (size, cum) in want.items():
        gsize, gcum, ltv = got[k]
        assert (gsize, gcum) == (size, cum)
        assert abs(ltv - cum / (100.0 * size)) < 1e-5
    # LTV curves are non-decreasing in age within a cohort
    for c in {k[0] for k in got}:
        curve = [got[k][2] for k in sorted(got) if k[0] == c]
        assert curve == sorted(curve)


def test_temperature_mix_matches_python_replay(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    lt = {}
    for r in docs:
        lt[r.lang] = lt.get(r.lang, 0) + len(r.text.split(" "))
    n = sum(lt.values())
    s = {
        lang: math.floor(1e6 * math.sqrt(tok) + 0.5)
        for lang, tok in lt.items()
    }
    s_sum = sum(s.values())
    rows = {
        r.lang: r
        for r in QUERIES["corpus_temperature_mix"](spark, sf_dir).collect()
    }
    assert set(rows) == set(lt)
    for lang, tok in lt.items():
        r = rows[lang]
        assert r.n_tokens == tok
        assert abs(r.nat_share - tok / n) < 1e-6
        assert abs(r.temp_weight - s[lang] / s_sum) < 1e-6
        assert abs(
            r.boost_factor - (s[lang] / s_sum) / (tok / n)
        ) < 1e-4
    # temperature flattens the mixture: minority languages boosted,
    # the dominant language damped (when mixture is non-uniform)
    if len(lt) > 1:
        dom = max(lt, key=lambda l: (lt[l], l))
        small = min(lt, key=lambda l: (lt[l], l))
        if lt[dom] != lt[small]:
            assert rows[dom].boost_factor < 1.0 + 1e-9
            assert rows[small].boost_factor > 1.0 - 1e-9
