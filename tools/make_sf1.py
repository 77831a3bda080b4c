"""Synthesize the sf1-scale fixture (committed form of the round-10
ad-hoc recipe, BASELINE.md "Round-10 bonus: sf1-scale shuffle stress").

DuckDB's tpch dbgen is unavailable offline, so sf1 is the sf0.1 fixture
replicated 10x with DISJOINT key offsets applied consistently across
PK/FK pairs, preserving referential integrity and density structure:

  replica i (0..9):
    c_custkey / o_custkey      += 1_000_000 * i
    o_orderkey / l_orderkey    += 10_000_000 * i
    p_partkey / l_partkey      += 1_000_000 * i
    s_suppkey / l_suppkey      += 100_000 * i
    event_id                   += 1_000_000 * i
    user_id                    += 1_000 * i
    doc_id                     += 1_000_000 * i
    vec_id                     += 1_000_000 * i
  region/nation are key domains shared by every replica and copied once.

Text/label/payload columns are NOT modified: every document text gains 10
exact duplicates (dedup stress) and the 10 embedding labels keep their
cardinality so label blocks grow 10x (the blocked-pair stress that caught
the emb_knn_graph quadratic).

Usage:  python tools/make_sf1.py [--src /root/testdata/sf0.1] [--out /tmp/hh_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "events": {"event_id": 1_000_000, "user_id": 1_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_ONLY = ("region", "nation")
REPLICAS = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/hh_sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_ONLY:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet'))"
            f" TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
            ).fetchall()
        ]
        parts = []
        for i in range(REPLICAS):
            sel = ", ".join(
                f"({c} + {offs[c] * i}) AS {c}" if c in offs else c
                for c in cols
            )
            parts.append(
                f"SELECT {sel} FROM read_parquet('{args.src}/{t}.parquet')"
            )
        union = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({union}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
