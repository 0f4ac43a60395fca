#!/usr/bin/env python
"""Host-window quality probe for the scaling study.

This Firecracker host is credit-throttled: in bad windows 8 vCPUs
deliver the same aggregate throughput as 2 (no spare silicon), so an
N-vs-4N measurement taken there says nothing about the ENGINE. The
probe measures pure-CPU parallel speedup (8 workers vs 1, no Spark, no
I/O) and reports it; the scaling driver (run_scaling_when_quiet.sh)
only records a pair when the hardware itself can scale.

Prints one line: ``speedup=<x> t1=<s> t8=<s>``; exit code 0 iff
speedup >= threshold (default 3.0, i.e. the hardware can do at least
3x with 8 threads — same bar the round-1 pure-JVM probe set).
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

N = 12_000_000


def burn(_):
    s = 0
    for i in range(N):
        s += i * i & 1023
    return s


def timed(workers: int) -> float:
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(burn, range(workers))
    return time.time() - t0


def main() -> None:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    timed(1)  # warm the pool path
    t1 = timed(1)  # 1 task on 1 worker
    t8 = timed(8)  # 8 tasks on 8 workers: wall == t1 iff 8 real cores
    speedup = 8 * t1 / t8  # aggregate-throughput ratio, ideal 8
    print(f"speedup={speedup:.2f} t1={t1:.2f} t8={t8:.2f}")
    sys.exit(0 if speedup >= threshold else 1)


if __name__ == "__main__":
    main()
