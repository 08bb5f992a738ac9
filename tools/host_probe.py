"""30-second host-health probe: is THIS hypervisor window worth a
scaling measurement?

Runs the same pure-Python CPU-burn control as tools/scaling_bench.py at
1 and 4 processes and reports effective cores. The r1-r5 campaign shows
the raw N-vs-4N scaling number tracks the burn control's delivered
cores monotonically (BENCH.md "Scaling re-measurement history"), so a
cheap probe first avoids burning a 20-minute full measurement on a
window where the host physically cannot deliver 4 cores.

Usage: python tools/host_probe.py   ->  one JSON line
Exit code 0 if the window looks healthy (>= 3.4 effective cores from 4
procs), 1 otherwise — scriptable as `host_probe.py && scaling_bench.py`.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 3_000_000


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def main() -> int:
    t0 = time.time()
    _burn(N)
    single = time.time() - t0
    out = {"single_burn_sec": round(single, 3)}
    for procs in (1, 4):
        with mp.Pool(procs) as p:
            p.map(_burn, [N // 10] * procs)  # warm the pool
            t0 = time.time()
            p.map(_burn, [N] * procs)
            out[f"effective_cores_{procs}"] = round(
                procs * single / (time.time() - t0), 2
            )
    healthy = out["effective_cores_4"] >= 3.4
    out["healthy"] = healthy
    print(json.dumps(out))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
