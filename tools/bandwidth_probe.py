#!/usr/bin/env python
"""Memory-bandwidth probe: quantify the single-socket wall behind the
Laplace N=16384 reversal (BASELINE.md round-7: C regains parity and
16 Spark blocks beat 32 — the classic bandwidth-saturation signature).

Method: the STREAM triad (a = b + s*c) over arrays far larger than
LLC, run in P independent PROCESSES (numpy elementwise ops are
single-threaded, and separate processes avoid the GIL and share
nothing), aggregate GB/s across P. If the machine scaled with cores,
aggregate bandwidth would grow ~linearly to 32; a plateau at small P
is the wall — past that point more threads only add contention, and
the win condition for the big-N solver is more MACHINES (each with
its own memory controllers), exactly as SCALE.md states.

Usage: python tools/bandwidth_probe.py [MiB-per-array] [procs...]
Prints one line per P: aggregate GB/s (triad moves 3 arrays per pass).
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _triad_worker(mib: int, reps: int, q) -> None:
    import numpy as np

    n = mib * 1024 * 1024 // 8
    b = np.ones(n)
    c = np.full(n, 2.0)
    a = np.empty(n)
    # one warm pass touches the pages
    np.add(b, 3.0 * c, out=a)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.add(b, 3.0 * c, out=a)
    dt = time.perf_counter() - t0
    # 3 arrays × 8 bytes moved per element per pass (write-allocate on
    # `a` makes real traffic closer to 4; report the STREAM convention)
    q.put(3.0 * n * 8 * reps / dt / 1e9)


def measure(procs: int, mib: int = 512, reps: int = 5) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_triad_worker, args=(mib, reps, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    mib = int(args[0]) if args else 512
    plist = [int(a) for a in args[1:]] or [1, 2, 4, 8, 16, 32]
    print(f"triad over {mib} MiB/array per process (3 arrays each)")
    for p in plist:
        gbs = measure(p, mib)
        print(f"procs={p:<3d} aggregate={gbs:7.1f} GB/s  per-proc={gbs / p:6.1f}")


if __name__ == "__main__":
    main()
