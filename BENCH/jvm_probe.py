#!/usr/bin/env python
"""Sustained pure-JVM compute probe (BASELINE.md cross-check).

A whole-stage-codegen aggregate over range() — no Python, no shuffle,
no I/O — measures what the HARDWARE gives N Spark threads over a
sustained window. Run back-to-back at 2 and 8 cores: the ratio is the
host's own 2->8 ceiling at measurement time; engine efficiency is
meaningful only relative to it (the host is credit-throttled and the
ceiling moves hour to hour).

Usage: python BENCH/jvm_probe.py <cores> [rows]
Prints one JSON line {"cores", "rows", "sec", "rows_per_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from network_feature_extractor_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000_000
    spark = get_spark(app_name=f"jvm-probe-{cores}", cores=cores,
                      shuffle_partitions=cores)
    # xxhash64 defeats closed-form shortcuts (the JVM must hash every
    # row); a FRESH DataFrame per action defeats Spark 4.1's repeated-
    # action result reuse (same Dataset collected twice returns cached)
    def build(n):
        return spark.range(0, n, 1, cores * 4).selectExpr(
            "sum(xxhash64(id) % 1000) as s"
        )

    build(rows // 10).collect()  # warmup (JIT)
    t0 = time.time()
    build(rows).collect()
    sec = time.time() - t0
    print(json.dumps({"cores": cores, "rows": rows, "sec": round(sec, 2),
                      "rows_per_sec": round(rows / sec / 1e6, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
