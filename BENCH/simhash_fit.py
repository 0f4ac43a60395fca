#!/usr/bin/env python
"""Fit the two-component dd_simhash window model from calibration lines.

    wall ~= A / compute_probe + B / shuffle_probe

A = compute-equivalent work (Mrows of the pure-JVM probe workload),
B = shuffle-equivalent work (Mrows of the exchange probe workload).
Least squares over all (1/cp, 1/sp) -> wall points; prints A, B,
per-point predicted wall and ratio, and the r5-driver-window check.

Usage: python BENCH/simhash_fit.py /tmp/simhash_calib.jsonl [more.jsonl...]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    pts = []
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                cp = (d["cp_pre"] + d["cp_post"]) / 2
                sp = (d["sp_pre"] + d["sp_post"]) / 2
                if cp and sp:
                    pts.append((cp, sp, d["wall_min"]))
    if len(pts) < 3:
        sys.exit(f"need >= 3 calibration points, got {len(pts)}")
    cp = np.array([p[0] for p in pts])
    sp = np.array([p[1] for p in pts])
    w = np.array([p[2] for p in pts])
    X = np.column_stack([1.0 / cp, 1.0 / sp])
    (A, B), res, *_ = np.linalg.lstsq(X, w, rcond=None)
    pred = A / cp + B / sp
    print(f"n={len(pts)}  A={A:.0f} Mrow-equiv compute  B={B:.1f} Mrow-equiv shuffle")
    print(f"residual rms={float(np.sqrt(np.mean((w - pred) ** 2))):.3f} s")
    print(" cp      sp     wall   pred   ratio  old_norm(w*sp/1e3)")
    for (c, s, wall), p in zip(pts, pred):
        print(
            f" {c:6.0f} {s:5.1f} {wall:6.2f} {p:6.2f} {wall / p:6.3f}"
            f"  {wall * s / 1e3:.3f}"
        )
    # the reading under adjudication: driver r5 window
    for tag, c, s, wall in [("r5-driver", (3912 + 984) / 2, (22.6 + 26.6) / 2, 10.9)]:
        p = A / c + B / s
        print(f"{tag}: cp~{c:.0f} sp~{s:.1f} wall {wall} pred {p:.2f} ratio {wall / p:.3f}")


if __name__ == "__main__":
    main()
