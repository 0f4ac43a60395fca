import json
import os

from network_feature_extractor_spark.sources import tables


def test_write_features_manifest_and_rotation(spark, turns, tmp_path):
    out = str(tmp_path / "features_out")
    manifest = tables.write_features(
        turns,
        out,
        partition_cols=None,
        max_records_per_file=100,  # rotation analog: size-bounded files
        compression="gzip",
        sort_cols=["conv_id", "turn_idx"],
        hash_files=True,
    )
    assert manifest["total_rows"] == turns.count()
    files = [f for f in os.listdir(out) if f.endswith(".parquet") or f.endswith(".gz.parquet")]
    assert len(files) > 1  # maxRecordsPerFile forced rotation
    disk = json.load(open(os.path.join(out, "_engine_manifest.json")))
    assert disk["total_rows"] == manifest["total_rows"]
    back = spark.read.parquet(out)
    assert back.count() == turns.count()
    # S5 completion: per-file SHA-256 content hashes (FileRotator analog)
    import hashlib

    assert set(manifest["files"]) == set(files)
    for rel, digest in manifest["files"].items():
        with open(os.path.join(out, rel), "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == digest, rel


def test_write_features_partitioned_hashes_cover_subdirs(spark, turns, tmp_path):
    out = str(tmp_path / "features_part_h")
    from pyspark.sql import functions as F

    d = turns.withColumn("bucket", (F.crc32("conv_id") % 4).cast("int"))
    manifest = tables.write_features(
        d, out, partition_cols=["bucket"], hash_files=True
    )
    import hashlib

    assert manifest["files"], "partitioned write must produce hashed files"
    for rel, digest in manifest["files"].items():
        assert rel.startswith("bucket=")
        with open(os.path.join(out, rel), "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == digest, rel


def test_write_features_hash_keys_decode_uri_escapes(spark, tmp_path):
    """Partition values with spaces: manifest keys must be the on-disk
    (decoded) relative paths, not percent-encoded URI fragments."""
    import hashlib

    df = spark.createDataFrame([(1, "a b"), (2, "a b"), (3, "c#d")], ["id", "name"])
    out = str(tmp_path / "uri_esc")
    manifest = tables.write_features(
        df, out, partition_cols=["name"], hash_files=True
    )
    assert manifest["files"]
    for rel, digest in manifest["files"].items():
        p = os.path.join(out, rel)
        assert os.path.exists(p), rel  # decoded key resolves on disk
        with open(p, "rb") as fh:
            assert hashlib.sha256(fh.read()).hexdigest() == digest, rel


def test_write_features_partitioned(spark, turns, tmp_path):
    out = str(tmp_path / "features_part")
    from pyspark.sql import functions as F

    d = turns.withColumn("bucket", (F.crc32("conv_id") % 4).cast("int"))
    manifest = tables.write_features(d, out, partition_cols=["bucket"])
    assert len(manifest["partitions"]) <= 4
    # integrity hashing is opt-in (it re-reads the written volume):
    # a plain feature write must not pay the second pass
    assert manifest["files"] == {}
    assert sum(manifest["partitions"].values()) == turns.count()
    back = spark.read.parquet(out)
    assert back.count() == turns.count()


def test_register_views(spark):
    tables.register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql("select count(*) from lineitem").collect()[0][0]
    assert n > 0


def test_partitioned_turns_layout_prunes(spark, turns, tmp_path):
    """days(ts)+bucket(conv_id)-style layout: a date filter must prune
    partitions at scan time (PartitionFilters in the physical plan)."""
    import os

    from pyspark.sql import functions as F

    out = str(tmp_path / "turns_part")
    tables.write_turns_partitioned(turns, out, conv_buckets=4)

    entries = os.listdir(out)
    assert any(e.startswith("ts_date=") for e in entries)

    back = spark.read.parquet(out)
    assert back.count() == turns.count()

    some_date = back.select(F.min("ts_date").alias("d")).collect()[0]["d"]
    q = back.filter(F.col("ts_date") == F.lit(some_date))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ts_date" in plan.split("PartitionFilters")[1][:120]
    assert q.count() > 0


def test_write_features_does_not_recompute_input(spark, tmp_path):
    """The manifest must come from the written files, not a second
    execution of the input DAG (at 100 TB that would double the job)."""
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)
    base = spark.range(100).withColumn("p", (F.col("id") % 2).cast("long"))

    def count_rows(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    df = base.mapInPandas(count_rows, schema="id long, p long")
    manifest = tables.write_features(df, str(tmp_path / "wf"), partition_cols=["p"])
    assert manifest["total_rows"] == 100
    assert acc.value == 100  # input DAG executed exactly once (the write)


def test_write_features_csv_sink(spark, turns, tmp_path):
    """Reference-format sink (csv_writer.py analog): headered gzip CSV
    with the same rotation/manifest contract as the parquet path."""
    import glob

    out = str(tmp_path / "csv_out")
    feats = turns.selectExpr("conv_id", "turn_idx", "length(text) as L")
    manifest = tables.write_features(
        feats, out, max_records_per_file=200, fmt="csv", compression="gzip"
    )
    files = glob.glob(out + "/*.csv.gz")
    assert files and len(files) >= 2  # rotation happened
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == feats.count()
    assert manifest["total_rows"] == feats.count()


def test_snapshot_versioning_time_travel(spark, turns, tmp_path):
    """Iceberg-analog snapshot log: versioned writes, atomic current
    pointer, time-travel reads, snapshot listing."""
    out = str(tmp_path / "snap")
    m1 = tables.write_features_snapshot(turns.limit(100), out)
    m2 = tables.write_features_snapshot(turns.limit(250), out)
    assert (m1["version"], m2["version"]) == (1, 2)
    assert tables.read_features_snapshot(spark, out).count() == 250  # current
    assert tables.read_features_snapshot(spark, out, version=1).count() == 100
    log = tables.list_feature_snapshots(out)
    assert [m["version"] for m in log] == [1, 2]
    assert log[0]["total_rows"] == 100 and log[1]["total_rows"] == 250
    assert all(m["files"] for m in log)  # content hashes per snapshot
    # pointer file flips atomically and names the latest version dir
    import json as _json

    cur = _json.load(open(os.path.join(out, "_current.json")))
    assert cur["version"] == 2
