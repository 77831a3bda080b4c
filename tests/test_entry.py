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
