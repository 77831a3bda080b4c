"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as ent


def test_entry_returns_rows(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "date",
        "date_pretty",
        "snippet_html",
        "sourceName",
        "sourceUrl",
        "suppressSource",
    }


def test_every_query_has_callable_and_runs_smoke(spark, sf_dir):
    qs = ent.queries()
    assert qs, "registry is empty"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        # schema resolves lazily; force analysis without full execution
        assert df.columns, name


def test_oracle_keys_subset_of_queries():
    qs = ent.queries()
    for key in ent.oracle_sql():
        assert key in qs


def test_front_keys_valid():
    """The driver samples the first 50 keys. Under the ledger-derived
    rotation, only NON-GREEN FRONT_KEYS lead (greens yield their slots),
    followed by other non-green evaluated keys, then the never-evaluated
    remainder — no ever-green key may occupy a window slot while any
    never-evaluated key waits."""
    qs = ent.queries()
    # Round 7+: FRONT_KEYS carries only curated exceptions (keys that must
    # jump the registration-order backlog queue), not a full 50-key window.
    assert 1 <= len(ent.FRONT_KEYS) <= 50
    assert len(set(ent.FRONT_KEYS)) == len(ent.FRONT_KEYS)
    missing = [k for k in ent.FRONT_KEYS if k not in qs]
    assert not missing, missing

    evaluated, green = ent._driver_ledger()
    window = list(qs)[:50]
    front_live = [k for k in ent.FRONT_KEYS if k not in green]
    assert window[: len(front_live)] == front_live
    # greens never starve the never-evaluated tail
    never = [k for k in qs if k not in evaluated]
    if len(front_live) + len(never) >= 50:
        leaked = [k for k in window if k in green]
        assert not leaked, leaked


def test_no_driver_hostile_output_types(spark, sf_dir):
    """The driver's canonicalizer chokes on array/map/struct cells
    (unhashable in its pandas sort) and stringifies Decimal differently per
    engine — so no query may emit them in its FINAL schema (r1 lesson:
    text_stem/agg_approx_quantile err'd, 7 decimal keys hash-failed)."""
    from pyspark.sql import types as T

    banned = (T.ArrayType, T.MapType, T.StructType, T.DecimalType)
    offenders = []
    for name, fn in ent.queries().items():
        df = fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, banned):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders
