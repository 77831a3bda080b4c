"""Semantics tests for the round-52 keys (script mix, decimal
contract, HHI) — independent Python re-derivations."""

from __future__ import annotations

import math
import re

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def _trunc_div(a, b):
    q = abs(a) // b
    return q if a >= 0 else -q


def test_script_mix_matches_python_replay(spark, sf_dir):
    per = {}
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        n_ascii = len(re.sub(r"[^a-zA-Z]", "", r.text))
        n_non = len(re.sub(r"[ -~]", "", r.text))
        n, a, na, m = per.get(r.lang, (0, 0, 0, 0))
        per[r.lang] = (
            n + 1,
            a + n_ascii,
            na + n_non,
            m + (1 if n_ascii >= 5 and n_non >= 5 else 0),
        )
    got = {
        r.lang: r
        for r in QUERIES["text_script_mix"](spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for lang, (n, a, na, m) in per.items():
        r = got[lang]
        assert (r.n_docs, r.ascii_letters, r.nonascii_chars, r.n_mixed) == (
            n, a, na, m,
        )
        assert r.mixed_rate_micro == _trunc_div(2000000 * m + n, 2 * n)


def test_decimal_contract_matches_python_replay(spark, sf_dir):
    per = {}
    for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        n, s = per.get(r.o_orderstatus, (0, 0))
        per[r.o_orderstatus] = (
            n + 1,
            s + math.floor(float(r.o_totalprice) * 100.0 + 0.5),
        )
    got = {
        r.o_orderstatus: (r.n, r.cents_sum)
        for r in QUERIES["sink_decimal_contract"](spark, sf_dir).collect()
    }
    assert got == per


def test_hhi_matches_python_replay(spark, sf_dir):
    supp = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        kd = math.floor(float(r.l_extendedprice) / 1000.0 + 0.5)
        supp[r.l_suppkey] = supp.get(r.l_suppkey, 0) + kd
    k = len(supp)
    tot = sum(supp.values())
    sq = sum(d * d for d in supp.values())
    top = max(supp.values())
    row = QUERIES["agg_hhi"](spark, sf_dir).collect()[0]
    assert (row.n_suppliers, row.total_kdollars) == (k, tot)
    assert row.hhi_micro == _trunc_div(
        2000000 * sq + tot * tot, 2 * tot * tot
    )
    assert row.effective_n == _trunc_div(2 * tot * tot + sq, 2 * sq)
    assert row.top_share_micro == _trunc_div(
        2000000 * top + tot, 2 * tot
    )
    # HHI bounds: 1/k <= HHI <= 1; effective_n <= k
    assert 1_000_000 // k - 1 <= row.hhi_micro <= 1_000_000
    assert row.effective_n <= k
