"""Raw host parallelism probe: aggregate throughput of K spinning
processes. Separates engine scaling behavior from hypervisor CPU
steal / SMT effects when interpreting N vs 4N results (BENCH.md)."""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _spin(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return acc


def measure(k: int, n: int = 20_000_000) -> float:
    with mp.Pool(k) as pool:
        t0 = time.time()
        pool.map(_spin, [n] * k)
        dt = time.time() - t0
    return (k * n) / dt  # iterations/sec aggregate


def main() -> None:
    out = {}
    for k in (1, 8, 16, 32):
        best = 0.0
        for _ in range(2):
            best = max(best, measure(k))
        out[str(k)] = round(best / 1e6, 1)  # M iter/s
    out["speedup_8_to_32"] = round(out["32"] / out["8"], 2)
    print(json.dumps({"metric": "cpu_probe_Miter_per_s", **out}))


if __name__ == "__main__":
    main()
