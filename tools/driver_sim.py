"""Driver-behavior simulator: run registry keys the way the spark-graft
driver does — sequentially, in serving order, in ONE SparkSession — and
check DOUBLE-RUN IDEMPOTENCY (the driver may retry a query; temp-path
reuse, conf leaks, cached-table collisions, or nondeterministic plans
all surface as a second-run hash mismatch).

This check found its purpose in round 4: the round-3 `stream_stateful`
red row was an environment-dependent divergence exactly of this class
(update-mode sink contents varying with micro-batching), and the whole
330-key registry was swept clean with it. Run it over any window before
staging the window for a driver round.

A second mode, --compare-partitions, re-runs each key under two
different spark.sql.shuffle.partitions settings (fresh sessions) and
diffs the value hashes — the executable form of the repo's
"bit-identical under any partitioning" claims (DECIMAL / fixed-point
reduction discipline). Round-4 sweep: 22 order-sensitive keys identical
at 3 vs 64 partitions.

Usage:
    python tools/driver_sim.py                 # first 50 (the live window)
    python tools/driver_sim.py --all           # whole registry
    python tools/driver_sim.py key1 key2 ...   # specific keys
    python tools/driver_sim.py --sf /root/testdata/sf0.001
    python tools/driver_sim.py --compare-partitions 3 64 key1 key2 ...
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted("|".join(repr(r[c]) for c in cols) for r in df.collect())
    m = hashlib.sha256()
    for r in rows:
        m.update(r.encode())
        m.update(b"\n")
    return m.hexdigest()


def _session(partitions: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument(
        "--compare-partitions", nargs=2, type=int, metavar=("A", "B")
    )
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as ent

    if args.compare_partitions:
        pa, pb = args.compare_partitions
        results = []
        for parts in (pa, pb):
            spark = _session(parts)
            q = ent.queries()
            keys = args.keys or list(q)[: args.window]
            results.append(
                {k: value_hash(q[k](spark, args.sf)) for k in keys}
            )
            spark.stop()
        diff = [k for k in results[0] if results[0][k] != results[1][k]]
        print(
            f"partition-sensitive keys ({pa} vs {pb}): "
            + (str(diff) if diff else f"none ({len(results[0])} identical)")
        )
        return 1 if diff else 0

    spark = _session(32)
    q = ent.queries()
    if args.keys:
        keys = args.keys
    elif args.all:
        keys = list(q)
    else:
        keys = list(q)[: args.window]

    bad: list[tuple[str, str]] = []
    for k in keys:
        t0 = time.time()
        try:
            h1 = value_hash(q[k](spark, args.sf))
            h2 = value_hash(q[k](spark, args.sf))
            if h1 != h2:
                bad.append((k, "second-run hash mismatch"))
                print(f"FAIL  {k}: second-run hash mismatch", flush=True)
            else:
                print(f"PASS  {k}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append((k, str(ex)[:120]))
            print(f"FAIL  {k}: {str(ex)[:120]}", flush=True)

    print(f"\n{len(keys) - len(bad)} idempotent, {len(bad)} failures")
    for k, why in bad:
        print(f"  {k}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
