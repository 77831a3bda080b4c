"""Scan every registered DuckDB oracle for int128-typed output columns.

The driver's compare materializes oracle results through Arrow/pandas,
where DuckDB HUGEINT (int128) surfaces as decimal128(38,0) / float64
while the Spark side emits BIGINT — so an oracle whose final SELECT
contains an uncast integer ``sum()`` (or ``//``) hash-mismatches on
*rendering* even when every value is identical. This scanner DESCRIBEs
each oracle against the sf0.001 views and reports any column whose
declared type is HUGEINT / UHUGEINT / DECIMAL(38,0).

Usage: python tools/oracle_type_scan.py [sf_dir]
Exit code 1 if any offender is found (usable as a CI gate).
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BAD_TYPES = {"HUGEINT", "UHUGEINT", "DECIMAL(38,0)"}


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def scan(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from hh_rumors_presto_spark.registry import ORACLES, load_all_queries

    load_all_queries()
    con = connect(sf_dir)
    offenders: dict[str, list] = {}
    errors: dict[str, str] = {}
    for key, sql in sorted(ORACLES.items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            errors[key] = f"{type(e).__name__}: {e}"[:200]
            continue
        bad = [
            (name, ctype)
            for name, ctype, *_ in rows
            if ctype.upper() in BAD_TYPES or ctype.upper().startswith("HUGEINT")
        ]
        if bad:
            offenders[key] = bad
    return {"offenders": offenders, "errors": errors, "total": len(ORACLES)}


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = scan(sf)
    print(json.dumps(out, indent=2, default=str))
    print(
        f"\n{len(out['offenders'])} offenders / {out['total']} oracles; "
        f"{len(out['errors'])} describe errors",
        file=sys.stderr,
    )
    sys.exit(1 if out["offenders"] else 0)
