"""Hardware scaling calibration for the sandbox VM.

The north-rule criterion (>=0.8 throughput scaling efficiency from N to
4N executors) is evidenced in this sandbox by thread-level parallelism
inside ONE VM.  That stand-in has a physical ceiling a real multi-executor
cluster does not: executors on separate nodes each bring their own memory
bus, while local[n] threads share one.  This microbenchmark measures the
VM's own ceiling for pure-CPU and memory-bandwidth-bound work at each
parallelism pair, so pipeline efficiency can be read against what the
hardware permits.  Writes BENCH/calibration.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def burn_cpu(_):
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.time() - t0


def burn_mem(_):
    a = np.random.rand(50_000_000)  # ~400 MB working set
    t0 = time.time()
    s = 0.0
    for _ in range(5):
        s += a.sum()
    return time.time() - t0


def throughput(fn, n: int) -> float:
    with mp.Pool(n) as p:
        ts = p.map(fn, range(n))
    return n / (sum(ts) / n)


def main() -> None:
    out = {"pairs": {}}
    for small, large in ((2, 8), (8, 32)):
        pair = {}
        for name, fn in (("cpu_bound", burn_cpu), ("memory_bound", burn_mem)):
            t_small = throughput(fn, small)
            t_large = throughput(fn, large)
            pair[name] = {
                f"throughput_{small}p": round(t_small, 2),
                f"throughput_{large}p": round(t_large, 2),
                "speedup": round(t_large / t_small, 3),
                "hardware_efficiency": round(t_large / t_small / (large / small), 3),
            }
        out["pairs"][f"{small}->{large}"] = pair
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "calibration.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
