#!/usr/bin/env python
"""dd_simhash normalized-metric calibration (r5 verdict task 1).

The r5 driver window read dd_simhash_shuffle_normalized = 0.271 against
the r4 band 0.15-0.21, in a window whose COMPUTE probe had also degraded
~4x (3912 -> 984 Mrows/s) — the wall x shuffle-probe model assumes the
query is purely shuffle-bound, but the explode + 65-column hash
aggregate has a real compute component, so a window where ALU throughput
collapses inflates the "shuffle-normalized" figure with compute time the
shuffle probe cannot see.

This script collects (compute_probe, shuffle_probe, dd_simhash wall)
triples in one session — one JSON line each — so the two-component model

    wall ~= A / compute_probe + B / shuffle_probe

can be fit across host windows (A, B in probe-equivalent Mrows; fit via
least squares over accumulated lines from several sessions). Run it a
few times across a round (host phases drift naturally, sampling
different cp/sp mixes); append all lines to one file and fit with
BENCH/simhash_fit.py.

Usage: python BENCH/simhash_calibration.py [--iters 8] [--cores 32]
       >> /tmp/simhash_calib.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2, help="query runs per iter; min kept")
    args = ap.parse_args()

    from bench import force, probe_mrows_per_sec, probe_shuffle_mrows_per_sec
    from network_feature_extractor_spark.plans.driver_queries import QUERIES
    from network_feature_extractor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"simhash-calib-{args.cores}", cores=args.cores,
        shuffle_partitions=max(args.cores, 8),
    )
    # warmup: JIT + parquet footers, discard
    force(QUERIES["dd_simhash"](spark, sf_dir))

    for i in range(args.iters):
        cp = probe_mrows_per_sec(spark, args.cores)
        sp = probe_shuffle_mrows_per_sec(spark, args.cores)
        walls = []
        for _ in range(max(args.repeats, 1)):
            t0 = time.time()
            force(QUERIES["dd_simhash"](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        sp2 = probe_shuffle_mrows_per_sec(spark, args.cores)
        cp2 = probe_mrows_per_sec(spark, args.cores)
        line = {
            "iter": i,
            "cores": args.cores,
            "cp_pre": cp, "cp_post": cp2,
            "sp_pre": sp, "sp_post": sp2,
            "walls": walls,
            "wall_min": min(walls),
            "norm_old": round(min(walls) * (sp + sp2) / 2 / 1e3, 3),
            "t": round(time.time(), 1),
        }
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
