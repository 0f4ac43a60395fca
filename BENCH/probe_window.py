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

``--write`` instead probes the WRITE path (pyarrow parquet to /tmp, no
Spark) and prints ``write_mrows=<x>``. Added in r7: all four r7 CPU-
gated pairs were invalidated by a window whose write bandwidth had
collapsed ~10x (Spark write probes 1.1-9.3 Mrows/s vs r6's 34-58) while
CPU probes passed 5.0-7.9 — the lean pipeline is write-bound (its top
stage is the bucketed save), so pair validity must bracket the
bottleneck resource too: a pair counts only if its three write probes
agree within 1.5x AND sit inside the calibrated support (see
BASELINE.md r7 for the calibration readings).
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

N = 12_000_000


def write_probe(mrows: float = 8.0) -> float:
    """Mrows/s of a two-int64-column snappy parquet write to /tmp —
    the no-Spark twin of bench.py's probe_write_mrows_per_sec (same
    resource: local-disk parquet encode+flush)."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = int(mrows * 1e6)
    a = np.arange(n, dtype=np.int64)
    tbl = pa.table({"a": a, "b": a % 997})
    fd, path = tempfile.mkstemp(suffix=".parquet", dir="/tmp")
    os.close(fd)
    try:
        t0 = time.time()
        pq.write_table(tbl, path, compression="snappy")
        with open(path, "rb") as f:
            os.fsync(f.fileno())
        dt = time.time() - t0
    finally:
        os.remove(path)
    return n / 1e6 / dt


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
    if "--write" in sys.argv[1:]:
        rates = [write_probe() for _ in range(2)]  # 2nd read discounts cache warmup
        print(f"write_mrows={min(rates):.1f} runs={[round(r,1) for r in rates]}")
        sys.exit(0)
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    timed(1)  # warm the pool path
    t1 = timed(1)  # 1 task on 1 worker
    t8 = timed(8)  # 8 tasks on 8 workers: wall == t1 iff 8 real cores
    speedup = 8 * t1 / t8  # aggregate-throughput ratio, ideal 8
    print(f"speedup={speedup:.2f} t1={t1:.2f} t8={t8:.2f}")
    sys.exit(0 if speedup >= threshold else 1)


if __name__ == "__main__":
    main()
