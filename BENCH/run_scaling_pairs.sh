#!/usr/bin/env bash
# Scaling-study driver for the credit-throttled host (see BASELINE.md).
#
# Problem: both per-core speed and parallel headroom swing 2-4x minute
# to minute, and a multi-minute Spark run spans several throttle
# windows. Protocol: SHORT runs (input sized so the 2-core leg fits in
# ~2 min), tightly interleaved 8c/2c pairs, each leg bracketed by the
# pure-CPU window probe (probe_window.py). A pair is VALID iff every
# bracketing probe shows the hardware itself scaling (speedup >= 3) —
# efficiency is then a property of the engine, not of the host window.
#
# Usage: bash BENCH/run_scaling_pairs.sh [n_pairs] [n_convs]
set -u
N_PAIRS=${1:-8}
N_CONVS=${2:-300000}
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N_PAIRS"); do
  echo "== pair $i"
  python BENCH/probe_window.py || true
  python BENCH/probe_window.py --write || true
  echo "-- 8c"
  python bench.py --cores 8 --convs "$N_CONVS" --skip-queries --repeats 1 --lean-pipeline --skip-big 2>/dev/null | tail -1
  python BENCH/probe_window.py || true
  python BENCH/probe_window.py --write || true
  echo "-- 2c"
  python bench.py --cores 2 --convs "$N_CONVS" --skip-queries --repeats 1 --lean-pipeline --skip-big 2>/dev/null | tail -1
  python BENCH/probe_window.py || true
  python BENCH/probe_window.py --write || true
done
