#!/usr/bin/env python
"""Task-slot occupancy from a Spark event log — the engine-side scaling
cross-check (BASELINE.md): if every core has a task >= ~95% of the
busy span, nothing in the ENGINE serializes; any wall-clock scaling
shortfall is the host (credit throttling), not the plan.

Usage: python BENCH/occupancy.py <eventlog-file-or-dir> <cores>
Prints overall occupancy and the top stages by busy time.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def newest(path: str) -> list[str]:
    """Newest log; a v2 rolling log is a DIRECTORY of events_* files."""
    if os.path.isfile(path):
        return [path]
    entries = [os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")]
    target = max(entries, key=os.path.getmtime)
    if os.path.isdir(target):
        return sorted(
            os.path.join(target, f)
            for f in os.listdir(target)
            if f.startswith("events_")
        )
    return [target]


def main() -> None:
    logs = newest(sys.argv[1])
    cores = int(sys.argv[2])
    tasks = []
    stage_busy: dict = defaultdict(float)
    stage_name: dict = {}
    for log in logs:
        with open(log) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info", {})
                    launch, finish = ti.get("Launch Time"), ti.get("Finish Time")
                    if launch and finish and finish > launch:
                        tasks.append((launch, finish))
                        stage_busy[ev.get("Stage ID")] += (finish - launch) / 1e3
                elif ev.get("Event") == "SparkListenerStageSubmitted":
                    si = ev.get("Stage Info", {})
                    stage_name[si.get("Stage ID")] = si.get("Stage Name", "")
    if not tasks:
        print("no tasks in log", logs)
        return
    t0 = min(t for t, _ in tasks)
    t1 = max(t for _, t in tasks)
    span = (t1 - t0) / 1e3
    busy = sum((b - a) / 1e3 for a, b in tasks)
    print(f"log={os.path.basename(logs[0])} tasks={len(tasks)} span={span:.1f}s "
          f"busy={busy:.1f} core-s occupancy={busy / (cores * span):.3f} (cores={cores})")
    for sid, b in sorted(stage_busy.items(), key=lambda kv: -kv[1])[:6]:
        print(f"  stage {sid}: busy={b:.1f} core-s  {stage_name.get(sid, '')[:70]}")


if __name__ == "__main__":
    main()
