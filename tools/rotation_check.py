"""Driver-evidence ledger: which registry keys still lack a driver
CORRECTNESS row, and what the next FRONT_KEYS window should contain.

The driver evaluates the first 50 registry keys per round (see
__spark_entry__.FRONT_KEYS). This tool unions every CORRECTNESS_r*.json
in the repo root, diffs against the live registry, and prints:

- per-round key counts and failures (there should be none);
- keys evaluated at least once (and whether their latest row was green);
- the never-evaluated remainder, in registration order — the candidate
  pool for the next rotation window.

Usage: python tools/rotation_check.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as ent

    registry = list(ent.queries())
    evaluated: dict[str, tuple[str, str]] = {}  # key -> (round file, status)
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        counts = {"green": 0, "rows_only": 0, "red": 0}
        fails = []
        for key, row in rows.items():
            if row.get("rows_match") and row.get("err") is None:
                status = "green"
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                # declared rows-only key: the driver ran it and counted rows
                status = "rows_only"
            else:
                status = "red"
                fails.append(key)
            counts[status] += 1
            evaluated[key] = (path.rsplit("/", 1)[-1], status)
        print(
            f"{path.rsplit('/', 1)[-1]}: {len(rows)} keys, "
            f"{counts['green']} green, {counts['rows_only']} rows-only"
            + (f", RED: {fails}" if fails else "")
        )

    never = [k for k in registry if k not in evaluated]
    stale_red = sorted(
        k
        for k, (_, status) in evaluated.items()
        if status == "red" and k in registry
    )
    print(f"\nregistry: {len(registry)} keys")
    print(f"evaluated at least once: {len(evaluated)}")
    if stale_red:
        print(f"latest row NOT green ({len(stale_red)}): {stale_red}")
    print(f"never evaluated: {len(never)}")
    print(f"\nnext window candidates (first {args.window}, registration order):")
    for k in never[: args.window]:
        print(f"  {k}")
    if len(never) > args.window:
        print(f"  ... and {len(never) - args.window} more")
    return 0


if __name__ == "__main__":
    sys.exit(main())
