"""Table sources and sinks.

Source analog of the reference's capture stack (SURVEY.md §2.1 S1-S3):
in a Spark engine a "source" is just a format + path; eBPF/raw-socket
alternatives collapse into alternative ``format()`` choices. The sink
analog of the CSV writer + rotation (S4/S5) is a partitioned parquet
write with ``maxRecordsPerFile`` and codec options — rotation,
compression, and atomic commit are engine built-ins.

Iceberg note: this sandbox has no Iceberg catalog jar, so the writer
emits Iceberg-*style* layout (partitioned parquet + a JSON manifest with
per-partition row counts = poor man's snapshot metadata). On a real
cluster swap ``write_features`` for ``df.writeTo(table).using("iceberg")``
— the DataFrame lineage is identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_turns(spark: SparkSession, path: str) -> DataFrame:
    """Read a turns table (parquet/Iceberg dir). Column pruning and
    predicate pushdown are Catalyst's; callers should select/filter
    as early as possible so the scan stays narrow."""
    return spark.read.parquet(path)


def write_turns(df: DataFrame, path: str, buckets: int = 0) -> None:
    """Write a turns table partitioned for downstream conv-keyed work."""
    w = df.repartition(F.col("conv_id")) if buckets == 0 else df.repartition(buckets, "conv_id")
    (
        w.sortWithinPartitions("conv_id", "ts", "turn_idx")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(path)
    )


def _sha256_files(spark: SparkSession, uris: list[str]) -> dict[str, str]:
    """Executor-side chunked SHA-256 of the given file URIs — one task
    hashes a slice of the file LIST, streaming each file in 8 MiB chunks
    (never materializing a whole file: no binaryFile 2 GB per-file limit,
    bounded memory at any file size). Local/file: URIs stream through
    plain ``open``; other schemes go through ``pyarrow.fs`` when the
    build supports them."""
    sc = spark.sparkContext
    n = max(1, min(len(uris), sc.defaultParallelism))
    rdd = sc.parallelize(sorted(uris), n)

    def hash_part(it):
        import hashlib
        from urllib.parse import unquote, urlparse

        for uri in it:
            h = hashlib.sha256()
            parsed = urlparse(uri)
            if parsed.scheme in ("", "file"):
                # the file index hands back percent-ENCODED URIs (the
                # on-disk `name=a b` dir arrives as `name=a%20b`, Hive's
                # own %23-escaping arrives DOUBLE-encoded as %2523), so
                # exactly one unquote recovers the raw path (verified in
                # test_write_features_hash_keys_decode_uri_escapes)
                local = unquote(parsed.path) if parsed.scheme else uri
                with open(local, "rb") as f:
                    for chunk in iter(lambda: f.read(8 << 20), b""):
                        h.update(chunk)
            else:  # pragma: no cover - no remote FS in this sandbox
                import pyarrow.fs as pafs

                # single-unquote contract, remote form: pyarrow's
                # FileSystem.from_uri ALREADY percent-decodes the path
                # component exactly once (verified:
                # from_uri('file:///a%20b/c%2520d') -> '/a b/c%20d'),
                # so the decoded key comes back in `p` — adding our own
                # unquote here would double-decode and break Hive's
                # %2523-style double-escapes
                fs, p = pafs.FileSystem.from_uri(uri)
                with fs.open_input_stream(p) as f:
                    while True:
                        chunk = f.read(8 << 20)
                        if not chunk:
                            break
                        h.update(chunk)
            yield uri, h.hexdigest()

    return dict(rdd.mapPartitions(hash_part).collect())


def write_features(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    compression: str = "zstd",
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    hash_files: bool = False,
) -> dict:
    """Partitioned feature sink (rotation analog S5): size-bounded files,
    compressed, stable intra-file ordering; returns a manifest dict with
    per-partition row counts (snapshot-metadata analog) and writes it
    next to the data.

    ``fmt="csv"`` matches the reference's actual output format
    (``src/output/csv_writer.py``: headered, gzip-rotated CSV) — parquet
    is the default because columnar + footer stats is what the 100 TB
    consumers want.

    ``hash_files`` (OPT-IN — r3 ADVICE): per-file SHA-256 integrity
    hashes (the reference FileRotator analog, file_rotation.py:540-723)
    necessarily re-read the written bytes — a full second pass over the
    data volume — so plain feature writes default it OFF; snapshot
    writes (``write_features_snapshot``), where integrity is the point,
    default it ON. Hashing streams in chunks executor-side
    (``_sha256_files``): no whole-file materialization, no binaryFile
    2 GB per-file ceiling, cost scales with data volume once and driver
    memory with file COUNT only."""
    writer = df
    if sort_cols:
        writer = writer.sortWithinPartitions(*sort_cols)
    w = (
        writer.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if fmt == "csv":
        # the reference CSV writer gzips rotated files (csv_writer.py);
        # zstd is not a Spark csv codec
        codec = "gzip" if compression == "zstd" else compression
        w.option("header", "true").option("compression", codec).csv(path)
    elif fmt == "parquet":
        w.option("compression", compression).parquet(path)
    else:
        raise ValueError(f"unsupported sink format: {fmt}")

    # manifest counts come from the WRITTEN files, not the input frame:
    # re-aggregating `df` would re-execute the whole upstream DAG a second
    # time (at 100 TB that doubles the job). Counting the written files is
    # a footer-metadata scan (same pattern as plans/checkpoint.py).
    if fmt == "csv":
        written = df.sparkSession.read.option("header", "true").csv(path)
    else:
        written = df.sparkSession.read.parquet(path)
    if partition_cols:
        counts = written.groupBy(*partition_cols).count().collect()
        parts = {
            "/".join(f"{c}={r[c]}" for c in partition_cols): r["count"] for r in counts
        }
    else:
        parts = {"<unpartitioned>": written.count()}

    # per-file SHA-256 (reference FileRotator's integrity hashes): the
    # file list comes from the written frame's own file index (the data
    # files Spark just committed — no glob guessing), hashed
    # executor-side in chunks. The index hands back percent-ENCODED URIs
    # (on-disk `name=a b` -> `name=a%20b`; Hive's own %23 dir escaping
    # arrives double-encoded), so exactly ONE unquote yields the raw
    # on-disk relative path the manifest keys on
    # (test_write_features_hash_keys_decode_uri_escapes).
    file_hashes: dict[str, str] = {}
    if hash_files:
        from urllib.parse import unquote, urlparse

        uris = written.inputFiles()
        digests = _sha256_files(df.sparkSession, list(uris))
        file_hashes = {
            os.path.relpath(unquote(urlparse(u).path), path): d
            for u, d in digests.items()
        }
    manifest = {
        "path": path,
        "partitions": parts,
        "total_rows": sum(parts.values()),
        "files": file_hashes,
    }
    with open(os.path.join(path, "_engine_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def write_turns_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 16,
    bucket_col: str = "conv_id",
    sort_cols: list[str] | None = None,
) -> None:
    """Hash-bucketed managed table (``bucketBy`` + ``sortBy``): two
    tables bucketed the same way join/aggregate on the bucket key with
    ZERO exchange — the physical partitioning is recorded in the catalog
    and Catalyst reuses it (asserted in tests/test_plans.py). This is
    the 100 TB co-located-join primitive: pay the shuffle once at write
    time, amortize it over every downstream conv-keyed job."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col, "ts", "turn_idx"]))
        .option("compression", "zstd")
        .format("parquet")
        .saveAsTable(table)
    )


def write_turns_partitioned(
    df: DataFrame, path: str, conv_buckets: int = 16
) -> None:
    """Iceberg-style partition layout for the turns table:
    ``ts_date=<day>/conv_bucket=<hash % n>`` — the ``days(ts)`` +
    ``bucket(conv_id)`` partition transform analog (SURVEY.md §4).
    Day filters prune partitions at scan time; the bucket dimension keeps
    conversations co-located for conv-keyed work and bounds file count.
    """
    (
        df.withColumn("ts_date", F.to_date("ts"))
        .withColumn("conv_bucket", (F.crc32(F.col("conv_id")) % conv_buckets).cast("int"))
        .repartition("ts_date", "conv_bucket")
        .sortWithinPartitions("conv_id", "ts", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("ts_date", "conv_bucket")
        .option("compression", "zstd")
        .parquet(path)
    )


# ---------------------------------------------------- snapshot versioning
# Poor-man's Iceberg snapshot log (no Iceberg jar in this sandbox — see
# module docstring): each versioned write lands in ``path/v{N}/`` with
# its own manifest (counts + per-file SHA-256 via write_features), then a
# tiny ``_current.json`` pointer flips atomically (tmp + rename). Readers
# pin a version for time travel or follow the pointer for latest; a
# crashed write never corrupts the current snapshot because the pointer
# flips only after the version directory is fully written. On a real
# cluster this maps 1:1 onto ``df.writeTo(table).using("iceberg")``
# snapshots + ``VERSION AS OF``.


def write_features_snapshot(
    df: DataFrame,
    path: str,
    **write_kwargs,
) -> dict:
    """Append a new immutable snapshot version; returns its manifest
    (with ``version`` added). Concurrency contract: one writer at a time
    (same as the reference's single rotator thread); readers are never
    blocked and always see a complete snapshot. Integrity hashes default
    ON here (a snapshot IS the integrity artifact) — pass
    ``hash_files=False`` to skip the extra read pass."""
    write_kwargs.setdefault("hash_files", True)
    os.makedirs(path, exist_ok=True)
    existing = [
        int(d[1:]) for d in os.listdir(path)
        if d.startswith("v") and d[1:].isdigit()
    ]
    version = max(existing, default=0) + 1
    vdir = os.path.join(path, f"v{version}")
    manifest = write_features(df, vdir, **write_kwargs)
    manifest["version"] = version
    pointer = {"version": version, "path": vdir}
    tmp = os.path.join(path, "_current.json.tmp")
    with open(tmp, "w") as f:
        json.dump(pointer, f)
    os.replace(tmp, os.path.join(path, "_current.json"))  # atomic flip
    return manifest


def read_features_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or ``version`` for time travel
    (Iceberg ``VERSION AS OF`` analog)."""
    if version is None:
        with open(os.path.join(path, "_current.json")) as f:
            version = json.load(f)["version"]
    return spark.read.parquet(os.path.join(path, f"v{version}"))


def list_feature_snapshots(path: str) -> list[dict]:
    """Snapshot log: every version's manifest, oldest first."""
    out = []
    for d in sorted(os.listdir(path)):
        if d.startswith("v") and d[1:].isdigit():
            mf = os.path.join(path, d, "_engine_manifest.json")
            if os.path.exists(mf):
                with open(mf) as f:
                    m = json.load(f)
                m["version"] = int(d[1:])
                out.append(m)
    return sorted(out, key=lambda m: m["version"])
