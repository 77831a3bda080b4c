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


def test_checks_literal_has_no_duplicate_keys():
    """A duplicate key in the CHECKS dict literal silently shadows the
    earlier entry (Python keeps the last), so a gate can vanish without
    any test failing — caught live in round 6 when new entries duplicated
    existing ones. Parse the literal and reject duplicates."""
    import ast
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "explain_audit.py",
    )
    tree = ast.parse(open(path).read())
    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            t = node.targets[0] if isinstance(node, ast.Assign) else node.target
            if getattr(t, "id", "") == "CHECKS" and node.value is not None:
                # the gate only works on a literal dict of constant keys:
                # a **spread entry (key is None) or computed key would
                # evade the duplicate scan, so reject those outright
                assert isinstance(node.value, ast.Dict), (
                    "CHECKS must be a dict literal"
                )
                assert all(
                    k is not None and isinstance(k, ast.Constant)
                    for k in node.value.keys
                ), "CHECKS keys must be plain string constants (no ** or computed keys)"
                keys = [k.value for k in node.value.keys]
                dups = sorted({k for k in keys if keys.count(k) > 1})
                assert not dups, f"duplicate CHECKS keys (earlier shadowed): {dups}"
                return
    raise AssertionError("CHECKS literal not found")
