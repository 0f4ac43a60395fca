"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension. Image/audio decode libraries are not
available in this environment, so the *decode kernel* is stubbed behind
``decode_fn`` (default: a deterministic fake that derives "pixels" from
the payload bytes); everything Spark-side — schema, partitioning, Arrow
batch shape, UDF signature — is real and tested. Swap ``decode_fn`` for
a real decoder (PIL/librosa/av) in production; the plan is unchanged.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
        T.StructField("std_intensity", T.DoubleType(), False),
        T.StructField("feature_vec", T.ArrayType(T.DoubleType()), False),
    ]
)


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder: interprets the payload
    bytes as a uint8 sample array. Replace with PIL/librosa in prod."""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table, oracle-derivable in ANSI SQL:
    payload i = ASCII bytes of repeat(md5(str(i)), 16)[:size(i)] with
    size(i) = 64 + (i*37 % 449). md5 keeps the bytes 'random-looking'
    while any SQL engine can regenerate them bit-for-bit."""
    import hashlib

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        size = 64 + (i * 37) % 449
        payload = (hashlib.md5(str(i).encode()).hexdigest() * 16)[:size].encode()
        rows.append(
            (
                i,
                kinds[i % 3],
                payload,
                64 if i % 3 == 0 else None,
                48 if i % 3 == 0 else None,
                float(size) / 100.0 if i % 3 != 0 else None,
                "application/octet-stream",
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] = fake_decode,
    vec_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Per item: byte count, intensity mean/std, and a fixed-dim pooled
    feature vector (mean over equal chunks) — the plumbing shape of a
    real embed step. Runs fully parallel; binary column never hits the
    driver. Repartition upstream by media_id for balanced batches.

    Stats use the explicit-moment form (sum / sum-of-squares): for
    integer-valued samples the sums are exact in float64, so the result
    is bit-identical in any engine — the same portability discipline as
    functions/stats.py:stddev_pop_moments.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "kind", "n_bytes", "mean_intensity", "std_intensity", "feature_vec")}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = decode_fn(bytes(payload), kind)
                if arr.size == 0:
                    arr = np.zeros(1)
                n = float(arr.size)
                m1 = float(arr.sum()) / n
                m2 = float((arr * arr).sum()) / n
                chunks = np.array_split(arr, vec_dim)
                vec = [
                    float(c.sum()) / float(c.size) if c.size else 0.0 for c in chunks
                ]
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["mean_intensity"].append(m1)
                out["std_intensity"].append(float(np.sqrt(max(m2 - m1 * m1, 0.0))))
                out["feature_vec"].append(vec)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts) —
    the explode step a real sampler would feed to the decoder. Decode
    itself is stubbed (NotImplementedError) pending codec libs."""
    d = media.filter(F.col("kind") == "video").withColumn(
        "n_frames",
        F.greatest((F.col("duration_s") * F.lit(fps)).cast("int"), F.lit(1)),
    )
    return d.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx", "_"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") / F.lit(fps)).alias("frame_ts"),
    )


def decode_frame(payload: bytes, frame_ts: float) -> np.ndarray:
    """Real video decode requires codec libraries not present here."""
    raise NotImplementedError(
        "video decode needs av/ffmpeg; wire a decoder into extract_media_features"
    )
