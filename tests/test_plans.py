"""Physical-plan regression gate: the scale-critical plan properties from
tools/explain_audit.py must hold (pushdown, pruning, broadcast, top-k
rewrites, partial aggregation)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as ent
from tools.explain_audit import CHECKS, FORBIDDEN, NO_EXCHANGE_KEYS


def _plan(spark, key, sf_dir):
    df = ent.queries()[key](spark, sf_dir)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize("key", sorted(CHECKS))
def test_plan_properties(spark, sf_dir, key):
    plan = _plan(spark, key, sf_dir)
    for pattern, label in CHECKS[key]:
        assert re.search(pattern, plan, re.DOTALL), f"{key}: missing {label}\n{plan[:3000]}"
    for bad, allowed in FORBIDDEN:
        if key not in allowed:
            assert bad not in plan, f"{key}: contains {bad}"


@pytest.mark.parametrize("key", NO_EXCHANGE_KEYS)
def test_zero_shuffle_plans(spark, sf_dir, key):
    plan = _plan(spark, key, sf_dir)
    assert "Exchange" not in plan, f"{key}: bucketing failed to co-locate\n{plan[:3000]}"
