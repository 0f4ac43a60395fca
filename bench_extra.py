#!/usr/bin/env python
"""Extra measurement harness for optimization rounds (bench.py is FROZEN
for driver measurement; this file holds the noop-sink isolation runs,
plan captures and pipeline stage breakdowns cited in OPTIMIZATION_r08.md).

Usage:
  python bench_extra.py queries [name ...] [--sf-dir D] [--repeats N]
      [--plans-dir plans/r08 --plan-suffix _before]
  python bench_extra.py pipeline [--convs N] [--all-modules]
      time the run_pipeline stages separately (probe / windows /
      materialize / snapshot+asof) over /tmp/bench_turns_<convs>
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def get_session(cores: int):
    from network_feature_extractor_spark.session import get_spark

    return get_spark(
        app_name=f"bench-extra-{cores}", cores=cores,
        shuffle_partitions=max(cores, 8),
    )


def capture_plan(df, path: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        f.write(plan)


def cmd_queries(args) -> None:
    from network_feature_extractor_spark.plans.driver_queries import QUERIES

    spark = get_session(args.cores)
    sf_dir = args.sf_dir
    names = args.names or list(QUERIES)
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bx:{name}")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            capture_plan(
                fn(spark, sf_dir),
                os.path.join(args.plans_dir, f"{name}{args.plan_suffix}.txt"),
            )
        if args.repeats == 0:  # plan capture only
            continue
        runs = []
        for _ in range(args.repeats + 1):  # first run = warmup
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        out[name] = {
            "warm": runs[0],
            "median": round(statistics.median(runs[1:]), 3),
            "runs": runs[1:],
        }
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "results": {k: v["median"] for k, v in out.items()}}))


def cmd_pipeline(args) -> None:
    from network_feature_extractor_spark.config import EngineConfig
    from network_feature_extractor_spark.datagen import generate_turns
    from network_feature_extractor_spark.plans.pipeline import (
        run_pipeline,
        per_turn_features,
        _materialize_per_turn,
        session_snapshot_table,
    )
    from network_feature_extractor_spark.operators.salted_windows import (
        per_turn_features_salted,
    )
    from pyspark.sql import functions as F

    spark = get_session(args.cores)
    if args.all_modules:
        cfg = EngineConfig(asof_hot_threshold=100_000)
    else:
        cfg = EngineConfig(
            asof_hot_threshold=100_000,
            enabled_features=("basic_metrics", "text_length"),
        )
    path = f"/tmp/bench_turns_{args.convs}"
    if not os.path.exists(path):
        generate_turns(spark, args.convs).write.mode("overwrite").parquet(path)
    turns = spark.read.parquet(path)
    n = turns.count()
    print(json.dumps({"turns": n}), flush=True)

    def t(label, fn):
        spark.sparkContext.setJobDescription(f"bx:{label}")
        t0 = time.time()
        fn()
        dt = round(time.time() - t0, 3)
        print(json.dumps({label: dt}), flush=True)
        spark.sparkContext.setJobDescription(None)
        return dt

    for rep in range(args.repeats):
        # stage 1: salted-probe + window DAG only (noop, no materialize)
        pt_cb = [None]

        def windows_only():
            pt = per_turn_features_salted(
                turns, cfg, hot_threshold=cfg.window_hot_threshold,
                block_rows=cfg.window_block_rows,
            ).withColumn("text_len", F.length("text").cast("double"))
            pt_cb[0] = pt
            force(pt)

        t(f"windows_noop_{rep}", windows_only)

        # stage 2: materialize (bucketed write) of the same frame
        mat_cb = [None]

        def materialize():
            mat_cb[0] = _materialize_per_turn(
                pt_cb[0], "/tmp/bx_pt_out", cfg
            )

        t(f"materialize_{rep}", materialize)

        # stage 3: snapshot aggregation from the materialized table
        snap_cb = [None]

        def snapshot():
            snap = session_snapshot_table(
                mat_cb[0].select(
                    "conv_id", "session_id", "role", "text_len", "tool",
                    "ts", "turn_idx",
                ),
                cfg,
            )
            snap_cb[0] = snap
            force(snap)

        t(f"snapshot_noop_{rep}", snapshot)

        # stage 4: the full pipeline (for the total to compare to bench.py)
        def full():
            enriched, _ = run_pipeline(turns, cfg, materialize_dir="/tmp/bx_pt_out2")
            force(enriched)

        t(f"pipeline_full_{rep}", full)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("queries")
    q.add_argument("names", nargs="*")
    q.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    q.add_argument("--repeats", type=int, default=3)
    q.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    q.add_argument("--plans-dir", default=None)
    q.add_argument("--plan-suffix", default="_before")
    q.set_defaults(fn=cmd_queries)
    p = sub.add_parser("pipeline")
    p.add_argument("--convs", type=int, default=100_000)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--all-modules", action="store_true")
    p.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.set_defaults(fn=cmd_pipeline)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
