"""Cross-engine result-TYPE parity audit (round-6 generalization of the
int128 oracle bug).

The driver compares Spark and DuckDB results through its own
materialization; a column whose TYPE FAMILY differs between the engines
can render differently (int 899 vs float 899.0 vs Decimal('899')) even
when every value is numerically equal — exactly how 41 HUGEINT oracles
sat local-green/driver-red for three rounds. This script builds each
registered Spark query (plan only — except streaming/iterative keys,
whose construction materializes), DESCRIBEs the matching oracle, and
reports any column whose type family diverges:

    integer    (Spark byte/short/int/long  | DuckDB *INT except HUGEINT)
    floating   (float/double               | REAL/FLOAT/DOUBLE)
    decimal    (decimal(p,s)               | DECIMAL(p,s))
    string     (string                     | VARCHAR)
    bool/date/timestamp/binary             (like for like)
    nested     (array/struct/map           | LIST/STRUCT/MAP)

Usage: python tools/type_parity_scan.py [--sf DIR] [key ...]
Exit 1 on any family mismatch (int128 is family 'int128', never OK).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if re.match(r"^(byte|short|int|integer|long|bigint)$", dt):
        return "integer"
    if dt in ("float", "double"):
        return "floating"
    if dt.startswith("decimal"):
        return "decimal"
    if dt == "string":
        return "string"
    if dt == "boolean":
        return "bool"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "binary":
        return "binary"
    if dt.startswith(("array", "struct", "map")):
        return "nested"
    return f"other:{dt}"


def duck_family(dt: str) -> str:
    dt = dt.upper()
    if dt in ("HUGEINT", "UHUGEINT") or dt == "DECIMAL(38,0)":
        return "int128"
    if re.match(r"^U?(TINY|SMALL|BIG)?INT(EGER)?$", dt):
        return "integer"
    if dt in ("REAL", "FLOAT", "FLOAT4", "FLOAT8", "DOUBLE"):
        return "floating"
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt in ("VARCHAR", "TEXT", "STRING"):
        return "string"
    if dt == "BOOLEAN":
        return "bool"
    if dt == "DATE":
        return "date"
    if dt.startswith("TIMESTAMP"):
        return "timestamp"
    if dt in ("BLOB", "BYTEA"):
        return "binary"
    if dt.endswith("[]") or dt.startswith(("STRUCT", "MAP", "LIST")):
        return "nested"
    return f"other:{dt}"


def diff_types(
    stypes: dict[str, str], drows: list[tuple]
) -> tuple[list[tuple], dict | None]:
    """Per-key schema diff: (family mismatches, order skew or None).

    ``stypes`` is the ORDERED Spark name->simpleString map; ``drows`` is
    the oracle's DESCRIBE rows (name, type, ...). BOTH directions are
    checked: an oracle column Spark never emits (MISSING-IN-SPARK) and —
    the reverse direction VERDICT r7 item 7 pinned — a Spark column the
    oracle never emits (MISSING-IN-ORACLE), which would otherwise pass
    silently even though the driver compares full column sets.
    Unit-tested by tests/test_verify_tools.py."""
    bad: list[tuple] = []
    dnames = [name for name, *_ in drows]
    for name, dtype, *_ in drows:
        if name not in stypes:
            bad.append((name, "MISSING-IN-SPARK", dtype))
            continue
        sf_, df_ = spark_family(stypes[name]), duck_family(dtype)
        if sf_ != df_:
            bad.append((name, f"spark:{stypes[name]}({sf_})", f"duck:{dtype}({df_})"))
    for name in stypes:
        if name not in dnames:
            bad.append((name, "MISSING-IN-ORACLE", stypes[name]))
    snames = list(stypes)
    skew = None
    if snames != dnames and sorted(snames) == sorted(dnames):
        skew = {"spark": snames, "duck": dnames}
    return bad, skew


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import duckdb

    from hh_rumors_presto_spark.registry import (
        ORACLES,
        QUERIES,
        load_all_queries,
    )
    from hh_rumors_presto_spark.session import get_spark

    load_all_queries()
    spark = get_spark("type_parity")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    keys = args.keys or sorted(k for k in QUERIES if k in ORACLES)
    mismatches: dict[str, list] = {}
    order_skews: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for key in keys:
        try:
            sdf = QUERIES[key](spark, args.sf)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            drows = con.execute(f"DESCRIBE {ORACLES[key]}").fetchall()
        except Exception as e:  # noqa: BLE001
            errors[key] = f"{type(e).__name__}: {e}"[:160]
            continue
        # column ORDER parity (the skew bucket): the harness/driver hash
        # sorts columns by name, so order skew never breaks a hash — but
        # it usually means an oracle was edited without its Spark twin.
        # Informational only; family mismatches stay the only red signal.
        bad, skew = diff_types(stypes, drows)
        if skew:
            order_skews[key] = skew
        if bad:
            mismatches[key] = bad
    print(json.dumps({"mismatches": mismatches, "order_skews": order_skews,
                      "errors": errors,
                      "checked": len(keys)}, indent=2, default=str))
    print(f"\n{len(mismatches)} keys with family mismatches; "
          f"{len(order_skews)} order-only skews (informational); "
          f"{len(errors)} errors", file=sys.stderr)
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
