"""Distribution-shaped per-group features via grouped Arrow UDFs
(SURVEY.md §2.3 A9-A13, §2.4 W9/W10).

These are the ~10% of reference features that are not algebraic:
exact numpy-parity quantiles, fixed-range histograms, IAT-distribution
entropy, skew/kurtosis with the reference's convention split, and FFT
periodicity. Each is one ``applyInPandas`` per (conv_id, session_id) —
Arrow-batched, vectorized numpy inside, no per-row Python. Group inputs
are bounded (a session's turns), so executor memory is safe at any total
scale; pathological sessions are capped by the caller via sessionization.

Reference formulas:
- quantiles: ``np.percentile`` linear interpolation at [.1,.25,.5,.75,.9]
  (``src/feature_extraction/packet_length.py:102,449-472``), median/IQR.
- histogram: ``np.histogram(bins=10, range=(0,1500))`` normalized
  (``packet_length.py:614-639``) — range rescaled to text lengths (0,4000).
- skewness: population 3rd standardized moment, 0 if n<3 or sigma=0
  (``packet_length.py:385-415``).
- kurtosis convention split (A11): text-length kurtosis is the RAW 4th
  moment (``packet_length.py:417-447``); IAT kurtosis is EXCESS (-3,
  ``timing_metrics.py:441``).
- IAT entropy: 20-bin histogram of IATs -> Shannon entropy normalized by
  log2(nbins) (``timing_metrics.py:496-535``).
- FFT periodicity: top peak power ratio + strongest period, gated on
  >=20 points, default-off like the reference's ``fft_enabled``
  (``timing_metrics.py:537-594,102``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

QUANTILE_LEVELS = (0.1, 0.25, 0.5, 0.75, 0.9)
HIST_BINS = 10
HIST_RANGE = (0.0, 4000.0)
IAT_ENTROPY_BINS = 20
FFT_MIN_POINTS = 20


def _pop_moments(x: np.ndarray) -> tuple[float, float]:
    mean = float(x.mean()) if x.size else 0.0
    std = float(np.sqrt(np.maximum((x * x).mean() - mean * mean, 0.0))) if x.size else 0.0
    return mean, std


def _skew(x: np.ndarray) -> float:
    if x.size < 3:
        return 0.0
    mean, std = _pop_moments(x)
    if std == 0.0:
        return 0.0
    return float(np.mean(((x - mean) / std) ** 3))


def _kurt_raw(x: np.ndarray) -> float:
    """Raw 4th standardized moment (packet-length convention, no -3)."""
    if x.size < 4:
        return 0.0
    mean, std = _pop_moments(x)
    if std == 0.0:
        return 0.0
    return float(np.mean(((x - mean) / std) ** 4))


def _iat_entropy(iats: np.ndarray) -> float:
    if iats.size < 2:
        return 0.0
    hist, _ = np.histogram(iats, bins=IAT_ENTROPY_BINS)
    p = hist[hist > 0] / hist.sum()
    if p.size <= 1:
        return 0.0
    return float(-(p * np.log2(p)).sum() / np.log2(IAT_ENTROPY_BINS))


def _fft_periodicity(rel_ts: np.ndarray) -> tuple[float, float]:
    """(periodicity_score, strongest_period). Gated on >= FFT_MIN_POINTS."""
    if rel_ts.size < FFT_MIN_POINTS:
        return 0.0, 0.0
    sig = rel_ts - rel_ts[0]
    power = np.abs(np.fft.rfft(sig)) ** 2
    power = power[1:]  # drop DC
    if power.size == 0 or power.sum() == 0:
        return 0.0, 0.0
    peak_idx = int(np.argmax(power))
    score = float(power[peak_idx] / power.sum())
    span = float(sig[-1] - sig[0]) if sig[-1] > sig[0] else 1.0
    freq = (peak_idx + 1) / span
    period = 1.0 / freq if freq > 0 else 0.0
    return score, float(period)


def distribution_features(
    turns_with_session: DataFrame,
    key_cols: list[str] | None = None,
    fft_enabled: bool = False,
    hist_range: tuple[float, float] = HIST_RANGE,
) -> DataFrame:
    """One row per key group with quantile/histogram/entropy/moment/FFT
    features over text lengths and IATs."""
    keys = key_cols or ["conv_id", "session_id"]

    in_types = {f.name: f.dataType for f in turns_with_session.schema.fields}
    fields = [T.StructField(k, in_types[k], False) for k in keys]
    feat_names = (
        [f"len_q{int(q * 100)}" for q in QUANTILE_LEVELS]
        + ["len_median", "len_iqr", "len_skew", "len_kurt_raw"]
        + [f"len_hist_{i}" for i in range(HIST_BINS)]
        + ["iat_skew", "iat_kurt_excess", "iat_entropy_norm"]
        + ["fft_periodicity", "fft_strongest_period"]
    )
    schema = T.StructType(fields + [T.StructField(n, T.DoubleType(), False) for n in feat_names])

    def one_group(kvals: tuple, lens: np.ndarray, ets: np.ndarray) -> dict:
        iats = np.diff(ets) if ets.size > 1 else np.array([], dtype=np.float64)
        qs = (
            np.percentile(lens, [q * 100 for q in QUANTILE_LEVELS])
            if lens.size
            else np.zeros(5)
        )
        hist, _ = np.histogram(lens, bins=HIST_BINS, range=hist_range)
        hist_p = hist / max(hist.sum(), 1)
        _, i_std = _pop_moments(iats)
        kurt_excess = (_kurt_raw(iats) - 3.0) if iats.size >= 4 and i_std > 0 else 0.0
        fft_s, fft_p = _fft_periodicity(ets) if fft_enabled else (0.0, 0.0)

        row = dict(zip(keys, kvals))
        row.update({f"len_q{int(q*100)}": float(v) for q, v in zip(QUANTILE_LEVELS, qs)})
        row["len_median"] = float(qs[2])
        row["len_iqr"] = float(qs[3] - qs[1])
        row["len_skew"] = _skew(lens)
        row["len_kurt_raw"] = _kurt_raw(lens)
        row.update({f"len_hist_{i}": float(hist_p[i]) for i in range(HIST_BINS)})
        row["iat_skew"] = _skew(iats)
        row["iat_kurt_excess"] = float(kurt_excess)
        row["iat_entropy_norm"] = _iat_entropy(iats)
        row["fft_periodicity"] = fft_s
        row["fft_strongest_period"] = fft_p
        return row

    def compute_block(pdf: pd.DataFrame) -> pd.DataFrame:
        # contiguous-sorted block: vectorize len/ts once, slice per group
        lens = pdf["_len"].to_numpy(dtype=np.float64)
        ets = pdf["_ets"].to_numpy(dtype=np.float64)
        gid = pdf["_gid"].to_numpy()
        bounds = np.flatnonzero(np.diff(gid)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pdf)]))
        kcols = [pdf[k].to_numpy() for k in keys]
        rows = [
            one_group(
                tuple(kc[s] for kc in kcols), lens[s:e], ets[s:e]
            )
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame(rows)

    def per_partition(it):
        # groups are contiguous (sorted within partition); carry the
        # possibly-incomplete last group across Arrow batch boundaries
        carry: pd.DataFrame | None = None
        for pdf in it:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_gid = pdf["_gid"].iloc[-1]
            complete = pdf[pdf["_gid"] != last_gid]
            carry = pdf[pdf["_gid"] == last_gid]
            if len(complete):
                yield compute_block(complete)
        if carry is not None and len(carry):
            yield compute_block(carry)

    from pyspark.sql import functions as F

    from ..functions.stats import epoch_seconds

    prepared = (
        turns_with_session.select(
            *keys,
            F.length("text").cast("double").alias("_len"),
            epoch_seconds("ts").alias("_ets"),
            F.xxhash64(*keys).alias("_gid"),
        )
        .repartition(*keys)
        .sortWithinPartitions(*keys, "_ets")
    )
    return prepared.mapInPandas(per_partition, schema=schema)
