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
    the explode step a real sampler would feed to the decoder. Pair
    with ``decode_frame`` (a real binary-PPM parser) for uncompressed
    frames; compressed codecs (h264 etc.) still need external libs and
    raise an honest ValueError in ``decode_media``."""
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


# ------------------------------------------------ real container decoders
# Dependency-free parsers for the two uncompressed containers (WAV PCM,
# PPM P6) — pure struct/numpy, no codec libraries. Compressed codecs
# (mp3/jpeg/h264) still need external libs; ``decode_frame`` raises
# ValueError for those rather than pretending to decode them.


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Minimal mono PCM16 WAV container (RIFF + fmt + data)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode a mono PCM16 WAV payload to float64 samples.

    Walks RIFF chunks (so extra chunks like LIST don't break parsing),
    validates the fmt chunk (PCM, 16-bit, mono), and interprets the data
    chunk as little-endian int16. Integer samples -> float64 is exact, so
    downstream sum/sumsq moments are bit-identical in any engine (the
    repo's exact-moment oracle discipline)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if clen > len(payload) - pos - 8:
            # a declared chunk length past the payload end must be an
            # honest error, not a silent short decode (decode_ppm's
            # 'truncated' contract)
            raise ValueError(f"truncated WAV payload ({cid!r} chunk)")
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("malformed WAV fmt chunk (< 16 bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_fmt, channels, _rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels != 1:
        raise ValueError(
            f"only mono PCM16 supported (fmt={audio_fmt}, bits={bits}, ch={channels})"
        )
    return np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
        np.float64
    )


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval<=255) frame to an (H, W, 3)
    float64 array — the uncompressed video-frame container."""
    import re

    # a '#' comment is spec-legal before EACH numeric token, not just
    # after the magic (r5 ADVICE): P6 \n 3 2 \n # c \n 255 must parse
    m = re.match(
        rb"P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+"
        rb"(?:#[^\n]*\n\s*)*(\d+)\s",
        payload,
    )
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raw = payload[m.end() : m.end() + w * h * 3]
    if len(raw) < w * h * 3:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(raw, dtype=np.uint8).astype(np.float64).reshape(h, w, 3)


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Container-sniffing decoder for ``extract_media_features``: WAV PCM
    and PPM frames decode for real (flattened to a 1-D sample array);
    anything else raises — compressed codecs need external libraries and
    an honest error beats a fake decode when real media flows through."""
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload).ravel()
    raise ValueError(f"unsupported container for kind={kind!r} (magic {payload[:4]!r})")


def decode_frame(payload: bytes, frame_ts: float) -> np.ndarray:
    """Decode one video frame payload (binary PPM) to an (H, W, 3) array.
    ``frame_ts`` identifies the frame for error context only — frame
    extraction happened upstream (``frame_sample_plan`` row per frame)."""
    try:
        return decode_ppm(payload)
    except ValueError as ex:
        raise ValueError(f"frame at ts={frame_ts}: {ex}") from ex


def synth_ppm_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic binary-PPM fixture, oracle-derivable in ANSI SQL
    (the ``synth_wav_media`` trick for the frame-decode path): item i is
    a P6 container, width 3 + i%5, height 2 + i%7 (both single-digit so
    the header is always the 11 bytes ``P6\\n{w} {h}\\n255\\n``), whose
    3*w*h raw "pixel" bytes are the ascii codes of
    ``repeat(md5(str(i)), 16)[: 3*w*h]`` — hex characters, so every
    sample is an exact small integer any SQL engine replays with
    ascii(substr(...))."""
    import hashlib

    rows = []
    for i in range(n):
        w, h = 3 + i % 5, 2 + i % 7
        npix = 3 * w * h
        raw = (hashlib.md5(str(i).encode()).hexdigest() * 16)[:npix].encode()
        payload = f"P6\n{w} {h}\n255\n".encode() + raw
        rows.append((i, "image", payload, w, h, None, "image/x-portable-pixmap"))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def synth_wav_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic WAV fixture, oracle-derivable in ANSI SQL: item i is
    a mono PCM16 container whose j-th sample (0-based, little-endian) is
        lo + 256*hi,  lo = ascii(s[2j]), hi = ascii(s[2j+1]),
        s = repeat(md5(str(i)), 16)
    with n_samples(i) = 32 + (i*17) % 97. The hex alphabet keeps hi < 128
    so every sample is a positive int16 and the signed decode is the same
    arithmetic any SQL engine can replay with ascii(substr(...))."""
    import hashlib

    rows = []
    for i in range(n):
        ns = 32 + (i * 17) % 97
        s = (hashlib.md5(str(i).encode()).hexdigest() * 16)[: 2 * ns].encode()
        arr = (
            np.frombuffer(s[0::2], dtype=np.uint8).astype(np.int32)
            + 256 * np.frombuffer(s[1::2], dtype=np.uint8).astype(np.int32)
        )
        payload = encode_wav_pcm16(arr.astype(np.int16), sample_rate=8000)
        rows.append(
            (i, "audio", payload, None, None, float(ns) / 8000.0, "audio/wav")
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
