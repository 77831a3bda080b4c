"""Semantics tests for the round-61 keys (records test, role-playing
dims, ABC-XYZ) — independent Python re-derivations."""

from __future__ import annotations

import math
from datetime import date

from hh_rumors_presto_spark import io
from hh_rumors_presto_spark.registry import QUERIES, load_all_queries

load_all_queries()


def test_records_test_matches_python_replay(spark, sf_dir):
    daily = {}
    for r in io.load_events(spark, sf_dir).collect():
        if r.event_type != "purchase" or r.value is None:
            continue
        d = r.ts.date()
        daily[d] = daily.get(d, 0) + math.floor(
            float(r.value) * 100.0 + 0.5
        )
    days = sorted(daily)
    peak = None
    n_rec = 0
    harm = 0
    for t, d in enumerate(days, start=1):
        if peak is None or daily[d] > peak:
            n_rec += 1
        peak = daily[d] if peak is None else max(peak, daily[d])
        harm += math.floor(1e6 / t + 0.5)
    row = QUERIES["ts_records_test"](spark, sf_dir).collect()[0]
    assert (row.n_days, row.n_records) == (len(days), n_rec)
    assert row.expected_micro == harm
    assert row.excess_micro == 1000000 * n_rec - harm
    # at least the first day is always a record
    assert row.n_records >= 1


def test_role_playing_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    orders = {
        r.o_orderkey: r.o_orderdate.date()
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    }
    cells = {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        od = orders[r.l_orderkey]
        sd = r.l_shipdate.date()
        key = ((od - epoch).days % 7, (sd - epoch).days % 7)
        n, s = cells.get(key, (0, 0))
        cells[key] = (
            n + 1,
            s + math.floor(float(r.l_extendedprice) * 100.0 + 0.5),
        )
    got = {
        (r.order_dow, r.ship_dow): (r.n_lines, r.cents_sum)
        for r in QUERIES["join_role_playing"](spark, sf_dir).collect()
    }
    assert got == cells
    # both roles use the SAME dim: dow domains match
    assert {k[0] for k in got} <= set(range(7))
    assert {k[1] for k in got} <= set(range(7))


def test_abc_xyz_matches_python_replay(spark, sf_dir):
    epoch = date(1970, 1, 5)
    rev, wk_demand = {}, {}
    for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        cents = math.floor(float(r.l_extendedprice) * 100.0 + 0.5)
        qty = math.floor(float(r.l_quantity) + 0.5)
        wk = (r.l_shipdate.date() - epoch).days // 7
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + cents
        key = (r.l_partkey, wk)
        wk_demand[key] = wk_demand.get(key, 0) + qty
    total = sum(rev.values())
    abc = {}
    cum = 0
    for part, cents in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += cents
        abc[part] = (
            "A" if 5 * cum <= 4 * total
            else ("B" if 20 * cum <= 19 * total else "C")
        )
    mom = {}
    for (part, _), q in wk_demand.items():
        n, s, sq = mom.get(part, (0, 0, 0))
        mom[part] = (n + 1, s + q, sq + q * q)
    xyz = {}
    for part, (n, s, sq) in mom.items():
        var_n = n * sq - s * s
        xyz[part] = (
            "X" if 4 * var_n <= s * s
            else ("Y" if var_n <= s * s else "Z")
        )
    cells = {}
    for part in rev:
        key = (abc[part], xyz[part])
        cells[key] = cells.get(key, 0) + 1
    got = {
        (r.abc, r.xyz): r.n_parts
        for r in QUERIES["agg_abc_xyz"](spark, sf_dir).collect()
    }
    assert got == cells
    assert sum(got.values()) == len(rev)
