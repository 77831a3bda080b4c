"""Constraint inference (operators/constraints.py) — tier-3 item 6.

Pins candidate-key detection and FK containment against the fixture
schema's known truths, plus a doctored violation so the negative path
is proven, not assumed.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hh_rumors_presto_spark.operators.constraints import (
    candidate_keys,
    fk_containment,
)


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def test_candidate_keys_on_orders(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    got = {
        r.column: r.is_candidate_key
        for r in candidate_keys(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
        ).collect()
    }
    assert got == {
        "o_orderkey": True,  # the PK
        "o_custkey": False,  # customers repeat
        "o_orderstatus": False,  # 3 values
    }


def test_fk_containment_holds_on_fixture_schema(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    assert fk_containment(orders, "o_custkey", customer, "c_custkey")["holds"]
    assert fk_containment(lineitem, "l_orderkey", orders, "o_orderkey")["holds"]


def test_fk_violation_detected_and_sampled(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    # doctor three orphan rows referencing customers that don't exist
    orphans = spark.createDataFrame(
        [(10**12 + i,) for i in range(3)], "o_custkey long"
    )
    doctored = orders.select("o_custkey").unionAll(orphans)
    res = fk_containment(doctored, "o_custkey", customer, "c_custkey")
    assert not res["holds"]
    assert res["n_violations"] == 3
    assert sorted(res["sample_violations"]) == [10**12, 10**12 + 1, 10**12 + 2]


def test_null_child_values_ignored(spark):
    # NULL FK references nothing (SQL semantics) and must not count as
    # a violation
    c = spark.createDataFrame([(1,), (None,)], "k long")
    p = spark.createDataFrame([(1,)], "k long")
    res = fk_containment(c, "k", p, "k")
    assert res["holds"] and res["n_violations"] == 0
