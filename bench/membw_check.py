"""Memory-bandwidth ceiling check: aggregate streaming throughput at
1/8/32 pinned workers.

Each worker process pins itself to one distinct CPU and streams
`np.copyto` over a buffer far larger than L3 for a fixed window; the
parent sums bytes moved. If the box's memory subsystem scaled with
cores, 32 workers would move ~4x what 8 move — the measured plateau is
the hardware ceiling that caps any allocation/streaming-heavy Spark
stage at high thread counts on ONE box (a real 4x-executor scale-out
multiplies memory controllers along with cores, so it does not hit
this wall). Companion evidence to bench/SCALING_NOTES.md.

Usage: python bench/membw_check.py [mb_per_worker] [seconds]
Prints one JSON line {"workers": {n: GB_per_s}, ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(cpu: int, mb: int, seconds: float, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    src = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    # touch both buffers so page faults happen before the timed window
    np.copyto(dst, src)
    moved = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        moved += src.nbytes * 2  # one read + one write stream per copy
    q.put(moved / (time.perf_counter() - t0))


def measure(n_workers: int, mb: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(cpu, mb, seconds, q))
        for cpu in range(n_workers)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / 1e9


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    out = {}
    for n in (1, 2, 8, 32):
        if n <= os.cpu_count():
            out[str(n)] = round(measure(n, mb, seconds), 2)
    print(json.dumps({"workers_gb_per_s": out, "mb_per_worker": mb}))


if __name__ == "__main__":
    main()
