#!/usr/bin/env python
"""Corpus-curation job entrypoint.

    spark-submit --py-files engine.zip jobs/run_curation.py \
        --input  /data/documents \
        --output /data/curated \
        --langs en,und --min-quality 0.55 [--near-dup]

Reads a documents table (doc_id, text[, ...]), runs the curation chain
(lang-ID + quality annotate -> filter -> exact dedup, optionally a
SimHash near-dup pass on the survivors), writes the curated table plus
the one-row per-stage attrition report (`_curation_report.json`) — the
numbers a data-quality dashboard ingests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--langs", default="en,und",
                    help="comma-separated allowed lang_pred values")
    ap.add_argument("--min-quality", type=float, default=0.55)
    ap.add_argument("--near-dup", action="store_true",
                    help="also drop SimHash near-duplicates (hamming <= 3) "
                         "among the curated survivors")
    ap.add_argument("--decontaminate", default=None, metavar="BENCH_PARQUET",
                    help="drop curated docs sharing word 8-grams with this "
                         "benchmark table (doc-level test-set overlap rule)")
    ap.add_argument("--max-records-per-file", type=int, default=5_000_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.operators import dedup
    from network_feature_extractor_spark.plans.curation import (
        curate_documents,
        curation_report,
    )
    from network_feature_extractor_spark.session import get_spark
    from network_feature_extractor_spark.sources.tables import write_features

    spark = SparkSession.getActiveSession() or get_spark(app_name="corpus-curation")
    langs = tuple(x for x in args.langs.split(",") if x)

    docs = spark.read.parquet(args.input)
    report = curation_report(
        docs, allowed_langs=langs, min_quality=args.min_quality
    ).collect()[0].asDict()

    curated = curate_documents(
        docs, allowed_langs=langs, min_quality=args.min_quality
    )
    report["n_decontaminated"] = 0
    if args.decontaminate:
        from network_feature_extractor_spark.operators.textstats import (
            contaminated_ids,
        )

        bench = spark.read.parquet(args.decontaminate)
        # materialize the tiny contaminated-id set once: unpersisted, the
        # full corpus gram-explode would recompute for the count, the
        # near-dup stage AND the final write (same pattern as
        # dup_clusters_bigstar's label checkpoint)
        bad = (
            contaminated_ids(curated, bench, n=8, min_shared=1)
            .select("doc_id")
            .localCheckpoint()
        )
        curated = curated.join(bad, "doc_id", "left_anti")
        report["n_decontaminated"] = bad.count()
        report["n_curated"] = report["n_curated"] - report["n_decontaminated"]

    report["n_near_dup_dropped"] = 0
    if args.near_dup:
        pairs = dedup.simhash_near_pairs(curated, max_hamming=3)
        clusters = dedup.dup_clusters_bigstar(pairs)
        losers = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
        curated = curated.join(losers, "doc_id", "left_anti")
        # the near-dup stage is part of the attrition story (r4 ADVICE:
        # a dashboard reading the report must see EVERY drop); the loser
        # set is already computed, so counting it costs one tiny job
        report["n_near_dup_dropped"] = losers.count()
        report["n_curated"] = report["n_curated"] - report["n_near_dup_dropped"]

    write_features(
        curated,
        os.path.join(args.output, "curated"),
        max_records_per_file=args.max_records_per_file,
    )
    # NOTE: the report is written with local open() — this entrypoint is
    # local-output-only (documented; the parquet write itself goes through
    # Spark and supports any URI). For object-store outputs, point
    # --output at a local staging dir and sync.
    with open(os.path.join(args.output, "_curation_report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
