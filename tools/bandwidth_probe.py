"""Measure the sandbox's aggregate memory-bandwidth scaling: N worker
processes each stream-copy a private buffer for a fixed wall window;
report aggregate GB/s at each N. This quantifies the node's attainable
parallel-scaling ceiling independent of any engine code — the context
needed to interpret `bench.py --scaling` numbers on this box
(BASELINE.md). Usage: python tools/bandwidth_probe.py [N ...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

BUF_MB = 256
WINDOW_S = 6.0


def _worker(q):
    import numpy as np

    src = np.random.default_rng(0).integers(0, 255, BUF_MB << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    end = time.time() + WINDOW_S
    n = 0
    while time.time() < end:
        np.copyto(dst, src)
        n += 1
    # one copy moves 2*BUF bytes (read + write)
    q.put(n * 2 * src.nbytes)


def measure(nprocs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(nprocs)]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / (time.time() - t0) / 1e9


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]
    out = {}
    for n in ns:
        out[n] = round(measure(n), 2)
        print(f"{n} procs: {out[n]} GB/s aggregate")
    if len(ns) >= 2:
        lo, hi = ns[0], ns[-1]
        print(
            f"scaling {lo}->{hi}: {out[hi]/out[lo]:.2f}x over {hi//lo}x procs "
            f"(efficiency {out[hi]/out[lo]/(hi/lo):.3f})"
        )
