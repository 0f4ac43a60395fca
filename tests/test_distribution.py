import numpy as np

from network_feature_extractor_spark.operators import distribution
from network_feature_extractor_spark.operators.sessionize import with_session_id


def test_distribution_features_match_numpy(spark, turns, turns_pd):
    d = with_session_id(turns)
    got = (
        distribution.distribution_features(d, key_cols=["conv_id", "session_id"])
        .toPandas()
        .sort_values(["conv_id", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    # recompute sessions + stats in pure numpy
    from oracle_pandas import per_turn_oracle

    pt = per_turn_oracle(turns_pd)
    t = turns_pd.merge(pt[["conv_id", "turn_idx", "session_id"]], on=["conv_id", "turn_idx"])
    for (conv_id, sid), g in t.groupby(["conv_id", "session_id"], sort=True):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        lens = g["text"].str.len().to_numpy(dtype=float)
        r = got[(got["conv_id"] == conv_id) & (got["session_id"] == sid)].iloc[0]
        qs = np.percentile(lens, [10, 25, 50, 75, 90])
        assert abs(r["len_q50"] - qs[2]) < 1e-9, (conv_id, sid)
        assert abs(r["len_iqr"] - (qs[3] - qs[1])) < 1e-9
        hist, _ = np.histogram(lens, bins=10, range=(0, 4000))
        hp = hist / max(hist.sum(), 1)
        assert abs(r["len_hist_0"] - hp[0]) < 1e-12
        # skew/kurt conventions
        if lens.size >= 3 and lens.std() > 0:
            m, s = lens.mean(), np.sqrt(((lens - lens.mean()) ** 2).mean())
            sk = np.mean(((lens - m) / s) ** 3)
            assert abs(r["len_skew"] - sk) < 1e-7
        if lens.size >= 4 and lens.std() > 0:
            m, s = lens.mean(), np.sqrt(((lens - lens.mean()) ** 2).mean())
            kr = np.mean(((lens - m) / s) ** 4)  # RAW, no -3 (A11)
            assert abs(r["len_kurt_raw"] - kr) < 1e-7


def test_kurtosis_convention_split(spark, micro_turns):
    """Packet-length kurtosis raw, IAT kurtosis excess — A11."""
    d = with_session_id(micro_turns)
    r = distribution.distribution_features(d).toPandas().iloc[0]
    # n=3 < 4 -> kurtosis gated to 0 (reference gates small groups)
    assert r["len_kurt_raw"] == 0.0
    # skew at n=3 is computed: lens 64/64/52
    lens = np.array([64.0, 64.0, 52.0])
    m = lens.mean()
    s = np.sqrt(((lens - m) ** 2).mean())
    assert abs(r["len_skew"] - np.mean(((lens - m) / s) ** 3)) < 1e-9
    # 2 IATs -> kurtosis gated to 0
    assert r["iat_kurt_excess"] == 0.0


def _reference_periodicity(timestamps: np.ndarray):
    """Independent imperative replica of the reference's
    _detect_periodicity (timing_metrics.py:537-588): full FFT, magnitude
    spectrum, local-maxima peaks, top-10 stable-sorted by magnitude,
    score = peak magnitude sum / total magnitude, period in sample units."""
    if len(timestamps) < 20:
        return 0.0, 0.0, np.zeros(10)
    fft_result = np.fft.fft(timestamps - timestamps[0])
    freqs = np.fft.fftfreq(len(timestamps))
    magnitude = np.abs(fft_result)
    peaks = []
    for i in range(1, len(magnitude) - 1):
        if magnitude[i] > magnitude[i - 1] and magnitude[i] > magnitude[i + 1]:
            peaks.append((i, magnitude[i]))
    peaks.sort(key=lambda x: x[1], reverse=True)
    top_peaks = peaks[:10]
    if not top_peaks:
        return 0.0, 0.0, np.zeros(10)
    total_power = np.sum(magnitude)
    peak_power = sum(p[1] for p in top_peaks)
    score = peak_power / total_power if total_power > 0 else 0
    strongest = 1.0 / abs(freqs[top_peaks[0][0]]) if top_peaks[0][0] > 0 else 0
    powers = np.zeros(10)
    for i, (_, p) in enumerate(top_peaks):
        powers[i] = p
    return float(score), float(strongest), powers


def test_fft_reference_parity(spark):
    """Engine FFT columns == the reference's imperative loop, per group,
    on irregular (bursty + jittered-periodic) timestamp patterns."""
    from datetime import datetime, timedelta

    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    t0 = datetime(2024, 1, 1)
    rng = np.random.default_rng(7)
    rows, expected_inputs = [], {}
    patterns = {
        "periodic": np.arange(40) * 5.0,
        "jittered": np.cumsum(5.0 + rng.normal(0, 0.8, 60).clip(-3, 3)),
        "bursty": np.concatenate([np.arange(12) * 0.5, 100 + np.arange(13) * 0.5]),
        "short": np.arange(10) * 2.0,  # below the 20-point gate
    }
    for conv, offs in patterns.items():
        # quantize to whole microseconds: timestamps round-trip through
        # datetime (us precision) and epoch doubles (~2.4e-7 ulp at 1.7e9),
        # so the expected input must be the post-truncation value
        offs_us = np.sort(np.round(np.asarray(offs) * 1e6).astype(np.int64))
        expected_inputs[conv] = offs_us / 1e6
        for i, o in enumerate(offs_us):
            rows.append(
                (conv, i, "user", "x", None, t0 + timedelta(microseconds=int(o)))
            )
    d = with_session_id(
        spark.createDataFrame(rows, schema=TURNS_SCHEMA), gap=1e9
    )
    got = (
        distribution.distribution_features(d, fft_enabled=True)
        .toPandas()
        .set_index("conv_id")
    )
    for conv, ets in expected_inputs.items():
        score, period, powers = _reference_periodicity(ets)
        r = got.loc[conv]
        # epoch-double ulp (~2.4e-7 at 1.7e9) propagates through the FFT:
        # never tighter than 1e-6 on time-derived values (CLAUDE.md), and
        # relative for the period (a near-tied peak pair could flip the
        # top index on another platform — that would exceed any tolerance
        # and is a legitimate failure)
        assert abs(r["fft_periodicity"] - score) < 1e-6, conv
        assert abs(r["fft_strongest_period"] - period) < 1e-6 * max(1.0, period), conv
        for i in range(10):
            tol = 1e-6 * max(1.0, powers[i])
            assert abs(r[f"fft_peak_power_{i}"] - powers[i]) < tol, (conv, i)
    # the short group is gated to all-zero
    assert got.loc["short", "fft_periodicity"] == 0.0
    assert got.loc["short", "fft_peak_power_0"] == 0.0
    # Parseval: spectrum energy == N * time-domain energy for every
    # eligible group (ratio exactly 1 up to fft rounding), 0 when gated
    for conv in ("periodic", "jittered", "bursty"):
        assert abs(got.loc[conv, "fft_parseval_ratio"] - 1.0) < 1e-9, conv
    assert got.loc["short", "fft_parseval_ratio"] == 0.0
    # non-vacuous: the irregular patterns must actually produce peaks
    assert got.loc["jittered", "fft_periodicity"] > 0
    assert got.loc["bursty", "fft_peak_power_0"] > 0


def test_fft_gating(spark, turns):
    """FFT features default-off -> zeros; enabled -> gated on >=20 points."""
    d = with_session_id(turns)
    off = distribution.distribution_features(d, fft_enabled=False).toPandas()
    assert (off["fft_periodicity"] == 0).all()

    # dense single-session conversation with period-3 gap modulation
    # (1s,1s,4s repeating): puts genuine local-maximum peaks in the
    # spectrum. (A perfectly LINEAR ramp has a monotone magnitude spectrum
    # with no strict local maxima, so reference semantics score it 0 —
    # that's parity, not a bug; period-2 modulation lands exactly on
    # Nyquist and dips instead of peaking.)
    from datetime import datetime, timedelta

    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    t0 = datetime(2024, 1, 1)
    gaps = ([1, 1, 4] * 10)[:30]
    offs = [sum(gaps[:i]) for i in range(30)]
    rows = [
        ("dense", i, "user" if i % 2 == 0 else "assistant", "x" * (10 + i % 7),
         None, t0 + timedelta(seconds=offs[i]))
        for i in range(30)
    ]
    dense = with_session_id(spark.createDataFrame(rows, schema=TURNS_SCHEMA))
    on = distribution.distribution_features(dense, fft_enabled=True).toPandas()
    assert (on["fft_periodicity"] > 0).any()


def test_assume_clustered_elides_repartition_and_matches(spark, turns):
    """r8: with ``assume_clustered=True`` on a window-partitioned input
    the grouped-map repartition must disappear from the plan and the
    output must be IDENTICAL to the repartitioned form (co-location is
    guaranteed by the upstream conv_id exchange)."""
    d = with_session_id(turns)
    flagged = distribution.distribution_features(
        d, key_cols=["conv_id", "session_id"], assume_clustered=True
    )
    plain = distribution.distribution_features(
        d, key_cols=["conv_id", "session_id"]
    )
    fplan = flagged._jdf.queryExecution().executedPlan().toString()
    pplan = plain._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" not in fplan
    assert "REPARTITION_BY_COL" in pplan

    a = flagged.toPandas().sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    b = plain.toPandas().sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    num = [c for c in a.columns if c not in ("conv_id", "session_id")]
    assert len(a) == len(b)
    assert np.allclose(
        a[num].to_numpy(float), b[num].to_numpy(float), rtol=0, atol=0
    )
