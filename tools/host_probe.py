"""Host-speed calibration probe for interpreting bench numbers.

The driver's BENCH_r{N}.json is recorded on whatever host the round
happens to land on, and rounds 1-3 have shown UNIFORM host-speed shifts
of 1.15-2x between sessions and even within one session (BASELINE.md
"host-shift calibration"). This probe pins a pure-CPython, Spark-free
reference workload so any bench total can be normalized:

    python tools/host_probe.py
    -> {"single_core_sec": ..., "parallel32_sec": ...}

Protocol: run it immediately before bench.py on an idle box and record
both numbers next to the bench total. Comparing two sessions' bench
totals only carries signal after dividing by their probe ratios.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

_N = 20_000_000


def _burn(_=None) -> int:
    x = 0
    for i in range(_N):
        x += i
    return x


def main() -> None:
    t0 = time.time()
    _burn()
    single = time.time() - t0

    t0 = time.time()
    with mp.Pool(32) as pool:
        pool.map(_burn, range(32))
    par = time.time() - t0

    print(
        json.dumps(
            {
                "single_core_sec": round(single, 3),
                "parallel32_sec": round(par, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
