"""Oracle output-type guard (round-6, VERDICT.md §"What's wrong" item 1).

The driver compares Spark vs DuckDB results after materializing the
DuckDB side through Arrow/pandas. DuckDB's ``sum()`` over integers
returns HUGEINT (int128), which Arrow renders as ``decimal128(38,0)``
and pandas as ``float64`` — so an oracle whose output column is an
uncast integer sum hash-diverges from Spark's LONG on *rendering* even
when every value is identical. Rounds 3-5 lost three driver rows
(stream_stateful, sim_ivfpq_search, sim_ivfpq_probe3) to exactly this,
with 38 more latent; round 6 cast all 41 to BIGINT. This test pins the
invariant: no registered oracle may emit an int128-family result column.

It DESCRIBEs every oracle (no data scanned), so the whole sweep is
seconds of DuckDB planning with no Spark session.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from hh_rumors_presto_spark.registry import ORACLES, load_all_queries

SF_DIR = os.environ.get("HH_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Types the driver's Arrow materialization renders differently from any
# type the Spark side can emit. HUGEINT/UHUGEINT -> decimal128(38,0);
# a literal DECIMAL(38,0) behaves identically.
INT128_FAMILY = {"HUGEINT", "UHUGEINT", "DECIMAL(38,0)"}


@pytest.fixture(scope="module")
def con():
    load_all_queries()
    c = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return c


def test_no_oracle_emits_int128(con):
    offenders = {}
    for key, sql in sorted(ORACLES.items()):
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (name, ctype)
            for name, ctype, *_ in rows
            if ctype.upper() in INT128_FAMILY
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        "oracles with int128-family output columns (wrap the offending "
        f"sum()/'//' in CAST(... AS BIGINT)): {offenders}"
    )


def test_all_oracles_describe_cleanly(con):
    """Every registered oracle must at least plan on the fixture views —
    catches syntax errors introduced by oracle edits without running
    anything."""
    errors = {}
    for key, sql in sorted(ORACLES.items()):
        try:
            con.execute(f"DESCRIBE {sql}")
        except Exception as e:  # noqa: BLE001
            errors[key] = f"{type(e).__name__}: {e}"[:200]
    assert not errors, f"oracles that fail to plan: {errors}"
