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
- FFT periodicity: top-10 local-maxima peak magnitudes over total
  magnitude + strongest period (sample units) + per-peak powers, gated
  on >=20 points, default-off like the reference's ``fft_enabled``
  (``timing_metrics.py:537-594,102-104``).
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


FFT_TOP_PEAKS = 10  # reference max_periodicity_bins (timing_metrics.py:103)


def _fft_periodicity(
    rel_ts: np.ndarray,
) -> tuple[float, float, np.ndarray, float]:
    """(periodicity_score, strongest_period, top-peak powers[10],
    parseval_ratio).

    parseval_ratio = sum|X_k|^2 / (N * sum(sig^2)) — Parseval's theorem
    says this is exactly 1 for any correct DFT (0 when the signal is
    all-zero, i.e. every ts equal). It rides along as a CHECKABLE
    invariant: the time-domain side is plain SQL, so a DuckDB oracle can
    assert the spectrum's total energy without having an FFT
    (driver query ``w10_fft_parseval``). Numerical slack is ~1e-12
    relative (fft rounding), absorbed by the 1e-6 rounding discipline.

    Reference-parity semantics (timing_metrics.py:537-588 _detect_periodicity):
    full FFT of (ts - ts[0]); MAGNITUDE spectrum (not power); peaks are the
    strict local maxima over indices 1..n-2 of the full (two-sided) spectrum;
    the top-10 peaks by magnitude (stable sort: ties keep ascending index)
    give periodicity_score = sum(top peak magnitudes) / sum(ALL magnitudes,
    DC included); strongest_period = 1/|fftfreq[top_idx]| in SAMPLE units;
    period_powers = the top-peak magnitudes, zero-padded to 10.
    Gated on >= FFT_MIN_POINTS points (min_points_for_periodicity).
    """
    powers = np.zeros(FFT_TOP_PEAKS)
    if rel_ts.size < FFT_MIN_POINTS:
        return 0.0, 0.0, powers, 0.0
    sig = rel_ts - rel_ts[0]
    magnitude = np.abs(np.fft.fft(sig))
    freqs = np.fft.fftfreq(sig.size)
    sumsq_time = float(np.sum(sig * sig))
    parseval = (
        float(np.sum(magnitude * magnitude)) / (sig.size * sumsq_time)
        if sumsq_time > 0
        else 0.0
    )
    inner = magnitude[1:-1]
    is_peak = (inner > magnitude[:-2]) & (inner > magnitude[2:])
    peak_idx = np.flatnonzero(is_peak) + 1
    if peak_idx.size == 0:
        return 0.0, 0.0, powers, parseval
    # stable sort by descending magnitude == reference's list.sort(reverse=True)
    order = np.argsort(-magnitude[peak_idx], kind="stable")
    top = peak_idx[order[:FFT_TOP_PEAKS]]
    total = float(magnitude.sum())
    peak_power = float(magnitude[top].sum())
    score = peak_power / total if total > 0 else 0.0
    strongest = 1.0 / abs(float(freqs[top[0]])) if top[0] > 0 else 0.0
    powers[: top.size] = magnitude[top]
    return score, strongest, powers, parseval


def distribution_features(
    turns_with_session: DataFrame,
    key_cols: list[str] | None = None,
    fft_enabled: bool = False,
    hist_range: tuple[float, float] = HIST_RANGE,
    assume_clustered: bool = False,
) -> DataFrame:
    """One row per key group with quantile/histogram/entropy/moment/FFT
    features over text lengths and IATs.

    ``assume_clustered=True``: the caller guarantees rows of any one
    key group are already co-located in one partition (e.g. the frame
    is hash-partitioned by a subset of ``key_cols``) — the grouped-map
    repartition is then elided and only the partition-local sort runs.
    """
    keys = key_cols or ["conv_id", "session_id"]

    in_types = {f.name: f.dataType for f in turns_with_session.schema.fields}
    fields = [T.StructField(k, in_types[k], False) for k in keys]
    feat_names = (
        [f"len_q{int(q * 100)}" for q in QUANTILE_LEVELS]
        + ["len_median", "len_iqr", "len_skew", "len_kurt_raw"]
        + [f"len_hist_{i}" for i in range(HIST_BINS)]
        + ["iat_skew", "iat_kurt_excess", "iat_entropy_norm"]
        + ["fft_periodicity", "fft_strongest_period"]
        + [f"fft_peak_power_{i}" for i in range(FFT_TOP_PEAKS)]
        + ["fft_parseval_ratio"]
    )
    schema = T.StructType(fields + [T.StructField(n, T.DoubleType(), False) for n in feat_names])

    def _lerp(a: np.ndarray, b: np.ndarray, t: np.ndarray) -> np.ndarray:
        # numpy's percentile lerp: interpolate from the nearer side for
        # stability — replicated so results are bit-identical to
        # np.percentile(..., method="linear")
        diff = b - a
        return np.where(t < 0.5, a + diff * t, b - diff * (1 - t))

    def compute_block(pdf: pd.DataFrame) -> pd.DataFrame:
        """All-groups-at-once vectorized feature computation.

        The block is sorted (keys, _ets) with contiguous groups; every
        statistic is computed with segment ops (reduceat / bincount /
        gather) — no per-group Python loop. ~8x faster than slicing per
        group at the 10-turns-per-session regime. FFT (default off)
        falls back to a loop over the few eligible groups.
        """
        n_rows = len(pdf)
        lens = pdf["_len"].to_numpy(dtype=np.float64)
        ets = pdf["_ets"].to_numpy(dtype=np.float64)
        gid = pdf["_gid"].to_numpy()
        bounds = np.flatnonzero(np.diff(gid)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [n_rows]))
        G = len(starts)
        n = (ends - starts).astype(np.float64)
        # per-row group index (0..G-1)
        gidx = np.zeros(n_rows, dtype=np.int64)
        gidx[bounds] = 1
        gidx = np.cumsum(gidx)

        out: dict[str, np.ndarray] = {}
        kcols = {k: pdf[k].to_numpy()[starts] for k in keys}

        # ---- len moments (centered -> numerically stable) -------------
        s1 = np.add.reduceat(lens, starts)
        mean = s1 / n
        c = lens - mean[gidx]
        c2 = np.add.reduceat(c * c, starts) / n
        std = np.sqrt(np.maximum(c2, 0.0))
        safe_std = np.where(std > 0, std, 1.0)
        z = c / safe_std[gidx]
        z3 = np.add.reduceat(z * z * z, starts) / n
        z4m = z * z
        z4 = np.add.reduceat(z4m * z4m, starts) / n
        out["len_skew"] = np.where((n >= 3) & (std > 0), z3, 0.0)
        out["len_kurt_raw"] = np.where((n >= 4) & (std > 0), z4, 0.0)

        # ---- len quantiles (per-group sorted via stable argsort) ------
        order = np.lexsort((lens, gidx))  # gidx (monotonic), NOT the hash
        slens = lens[order]
        for q in QUANTILE_LEVELS:
            pos = (q * 100 / 100.0) * (n - 1)
            lo = np.floor(pos).astype(np.int64)
            t = pos - lo
            a = slens[starts + lo]
            b = slens[np.minimum(starts + lo + 1, ends - 1)]
            out[f"len_q{int(q * 100)}"] = _lerp(a, b, t)
        out["len_median"] = out["len_q50"]
        out["len_iqr"] = out["len_q75"] - out["len_q25"]

        # ---- len fixed-range histogram (np.histogram semantics) -------
        lo_r, hi_r = hist_range
        width = hi_r - lo_r
        in_range = (lens >= lo_r) & (lens <= hi_r)
        bucket = np.minimum(
            ((lens - lo_r) * (HIST_BINS / width)).astype(np.int64), HIST_BINS - 1
        )
        flat = np.where(in_range, gidx * HIST_BINS + bucket, -1)
        counts = np.bincount(flat[flat >= 0], minlength=G * HIST_BINS).reshape(
            G, HIST_BINS
        )
        denom = np.maximum(counts.sum(axis=1), 1)
        hist_p = counts / denom[:, None]
        for i in range(HIST_BINS):
            out[f"len_hist_{i}"] = hist_p[:, i]

        # ---- IATs: diff within group ----------------------------------
        iat = np.empty(n_rows, dtype=np.float64)
        iat[1:] = ets[1:] - ets[:-1]
        iat[starts] = np.nan  # group-first rows carry no IAT
        valid = ~np.isnan(iat)
        ni = n - 1.0  # IAT count per group
        iat0 = np.where(valid, iat, 0.0)
        is1 = np.add.reduceat(iat0, starts)
        imean = np.where(ni > 0, is1 / np.maximum(ni, 1.0), 0.0)
        ic = np.where(valid, iat - imean[gidx], 0.0)
        ic2 = np.where(ni > 0, np.add.reduceat(ic * ic, starts) / np.maximum(ni, 1.0), 0.0)
        istd = np.sqrt(np.maximum(ic2, 0.0))
        safe_istd = np.where(istd > 0, istd, 1.0)
        iz = ic / safe_istd[gidx]
        iz3 = np.where(ni > 0, np.add.reduceat(iz * iz * iz, starts) / np.maximum(ni, 1.0), 0.0)
        izm = iz * iz
        iz4 = np.where(ni > 0, np.add.reduceat(izm * izm, starts) / np.maximum(ni, 1.0), 0.0)
        out["iat_skew"] = np.where((ni >= 3) & (istd > 0), iz3, 0.0)
        out["iat_kurt_excess"] = np.where((ni >= 4) & (istd > 0), iz4 - 3.0, 0.0)

        # ---- IAT entropy: per-group 20-bin hist over (min, max) --------
        big = np.where(valid, iat, np.inf)
        small = np.where(valid, iat, -np.inf)
        imin = np.minimum.reduceat(big, starts)
        imax = np.maximum.reduceat(small, starts)
        span = imax - imin
        safe_span = np.where(span > 0, span, 1.0)
        with np.errstate(invalid="ignore", over="ignore"):
            ibf = (iat0 - imin[gidx]) * (IAT_ENTROPY_BINS / safe_span[gidx])
            ib = np.nan_to_num(ibf, nan=0.0, posinf=0.0, neginf=0.0).astype(np.int64)
        ib = np.clip(ib, 0, IAT_ENTROPY_BINS - 1)
        iflat = np.where(valid, gidx * IAT_ENTROPY_BINS + ib, -1)
        icounts = np.bincount(
            iflat[iflat >= 0], minlength=G * IAT_ENTROPY_BINS
        ).reshape(G, IAT_ENTROPY_BINS)
        itot = np.maximum(icounts.sum(axis=1), 1)
        p = icounts / itot[:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            plogp = np.where(p > 0, p * np.log2(p), 0.0)
        nonzero_bins = (icounts > 0).sum(axis=1)
        ent = -plogp.sum(axis=1) / np.log2(IAT_ENTROPY_BINS)
        out["iat_entropy_norm"] = np.where(
            (ni >= 2) & (nonzero_bins > 1), ent, 0.0
        )

        # ---- FFT (default off; loop over eligible groups only) --------
        fftp = np.zeros(G)
        fftf = np.zeros(G)
        fftw = np.zeros((G, FFT_TOP_PEAKS))
        fftv = np.zeros(G)
        if fft_enabled:
            elig = np.flatnonzero(n >= FFT_MIN_POINTS)
            for g in elig:
                s_, e_ = starts[g], ends[g]
                fftp[g], fftf[g], fftw[g], fftv[g] = _fft_periodicity(
                    ets[s_:e_]
                )
        out["fft_periodicity"] = fftp
        out["fft_strongest_period"] = fftf
        for i in range(FFT_TOP_PEAKS):
            out[f"fft_peak_power_{i}"] = fftw[:, i]
        out["fft_parseval_ratio"] = fftv

        res = {k: v for k, v in kcols.items()}
        res.update({name: out[name] for name in feat_names})
        return pd.DataFrame(res)

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

    from ..functions.stats import epoch_seconds, text_len_col

    slim = turns_with_session.select(
        *keys,
        text_len_col(turns_with_session).alias("_len"),
        epoch_seconds("ts").alias("_ets"),
        F.xxhash64(*keys).alias("_gid"),
    )
    # r8: skip the explicit repartition when the caller GUARANTEES the
    # input is hash-clustered on a (prefix of the) group keys — the
    # pipeline's bucketed per-turn table: HashPartitioning(conv_id)
    # co-locates every (conv_id, session_id) group by the subset rule,
    # so the grouped map only needs the local sort below. Opt-in only
    # (``assume_clustered=True`` or the ``_nfe_assume_clustered``
    # marker run_pipeline stamps on the bucketed read): physical-plan
    # sniffing cannot prove it — Spark's auto-bucketed-scan reports the
    # bucketing only when the FULL query needs the distribution, so a
    # probe of the bare subtree reads UnknownPartitioning.
    if not (assume_clustered or getattr(turns_with_session, "_nfe_assume_clustered", False)):
        slim = slim.repartition(*keys)
    prepared = slim.sortWithinPartitions(*keys, "_ets")
    return prepared.mapInPandas(per_partition, schema=schema)
