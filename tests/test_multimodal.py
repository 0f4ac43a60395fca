import numpy as np
import pytest

from network_feature_extractor_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, n=48).cache()


def test_media_features_shape_and_determinism(spark, media):
    feats = multimodal.extract_media_features(media).toPandas()
    assert len(feats) == 48
    assert set(feats["kind"]) == {"image", "audio", "video"}
    assert (feats["n_bytes"] > 0).all()
    assert feats["feature_vec"].map(len).eq(8).all()
    # deterministic across runs
    again = multimodal.extract_media_features(media).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    assert np.allclose(
        np.stack(a["feature_vec"]), np.stack(b["feature_vec"])
    )
    assert np.allclose(a["mean_intensity"], b["mean_intensity"])


def test_media_features_match_numpy(spark, media):
    pdf = media.toPandas()
    feats = (
        multimodal.extract_media_features(media)
        .toPandas()
        .set_index("media_id")
    )
    for _, row in pdf.head(10).iterrows():
        arr = np.frombuffer(bytes(row["payload"]), dtype=np.uint8).astype(np.float64)
        got = feats.loc[row["media_id"]]
        assert abs(got["mean_intensity"] - arr.mean()) < 1e-9
        assert abs(got["std_intensity"] - arr.std()) < 1e-9


def test_frame_sample_plan(spark, media):
    plan = multimodal.frame_sample_plan(media, fps=2.0).toPandas()
    assert (plan["frame_idx"] >= 0).all()
    vids = media.filter("kind = 'video'").toPandas()
    # one video with duration d -> ceil-ish 2*d frames (>=1)
    per = plan.groupby("media_id").size()
    assert set(per.index) == set(vids["media_id"])


def test_wav_roundtrip_exact():
    samples = np.array([-32768, -1, 0, 1, 127, 32767, -12345], dtype=np.int16)
    wav = multimodal.encode_wav_pcm16(samples, sample_rate=16000)
    dec = multimodal.decode_wav(wav)
    assert dec.dtype == np.float64
    assert np.array_equal(dec, samples.astype(np.float64))


def test_wav_rejects_non_pcm16():
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"nonsense")
    # stereo / 8-bit containers must be rejected, not mis-decoded
    import struct

    bad_fmt = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        multimodal.decode_wav(bad_fmt)


def test_ppm_decode_and_frame():
    ppm = b"P6\n# c\n3 2\n255\n" + bytes(range(18))
    img = multimodal.decode_ppm(ppm)
    assert img.shape == (2, 3, 3) and img[1, 2, 2] == 17.0
    assert np.array_equal(multimodal.decode_frame(ppm, 0.5), img)
    with pytest.raises(ValueError):
        multimodal.decode_frame(b"\x00\x01", 0.5)  # unknown container
    with pytest.raises(ValueError):
        multimodal.decode_ppm(b"P6\n3 2\n255\n" + bytes(3))  # truncated


def test_ppm_comment_before_each_token():
    """Spec-legal P6 headers may carry '#' comments before ANY numeric
    token, not just right after the magic (r5 ADVICE)."""
    body = bytes(range(18))
    for hdr in (
        b"P6\n3 2\n# c\n255\n",       # comment before maxval
        b"P6\n# a\n3\n# b\n2\n255\n",  # before width's successor + maxval
        b"P6\n3\n# x\n# y\n2\n255\n",  # stacked comments mid-header
    ):
        img = multimodal.decode_ppm(hdr + body)
        assert img.shape == (2, 3, 3) and img[1, 2, 2] == 17.0


def test_synth_ppm_media_decodes_to_known_moments(spark):
    """The PPM fixture mirrors synth_wav_media's contract: pixel values
    are ascii codes of md5 hex chars — re-derive item moments
    independently and compare the full Spark decode path exactly."""
    import hashlib

    media = multimodal.synth_ppm_media(spark, n=8)
    feats = (
        multimodal.extract_media_features(media, decode_fn=multimodal.decode_media)
        .toPandas()
        .set_index("media_id")
    )
    for i in range(8):
        w, h = 3 + i % 5, 2 + i % 7
        raw = (hashlib.md5(str(i).encode()).hexdigest() * 16)[: 3 * w * h].encode()
        vals = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        r = feats.loc[i]
        assert r["n_bytes"] == 11 + 3 * w * h
        assert r["mean_intensity"] == vals.sum() / vals.size
        m1, m2 = vals.sum() / vals.size, (vals * vals).sum() / vals.size
        assert r["std_intensity"] == np.sqrt(max(m2 - m1 * m1, 0.0))


def test_decode_media_dispatch_rejects_compressed():
    with pytest.raises(ValueError):
        multimodal.decode_media(b"\xff\xd8\xff\xe0jpeg", "image")


def test_synth_wav_media_decodes_to_known_moments(spark):
    """The WAV fixture's samples are ascii-pair arithmetic over the md5
    string — re-derive item 0's moments independently and compare the
    full Spark path (mapInPandas decode) against them exactly."""
    import hashlib

    media = multimodal.synth_wav_media(spark, n=8)
    feats = (
        multimodal.extract_media_features(media, decode_fn=multimodal.decode_media)
        .toPandas()
        .set_index("media_id")
    )
    for i in range(8):
        ns = 32 + (i * 17) % 97
        s = (hashlib.md5(str(i).encode()).hexdigest() * 16)[: 2 * ns].encode()
        v = (
            np.frombuffer(s[0::2], np.uint8).astype(np.int64)
            + 256 * np.frombuffer(s[1::2], np.uint8).astype(np.int64)
        )
        m1 = v.sum() / ns
        m2 = (v * v).sum() / ns
        got = feats.loc[i]
        assert got["n_bytes"] == 44 + 2 * ns
        assert got["mean_intensity"] == m1  # exact: integer sums in f64
        assert got["std_intensity"] == np.sqrt(max(m2 - m1 * m1, 0.0))


def test_wav_rejects_truncated_and_malformed_chunks():
    import struct

    import numpy as np

    good = multimodal.encode_wav_pcm16(np.array([1, 2, 3], dtype=np.int16))
    # data chunk declaring more bytes than the payload holds
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(good[:-2])
    # fmt chunk body shorter than the 16-byte PCM header
    bad_fmt = (
        b"RIFF" + struct.pack("<I", 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError, match="fmt"):
        multimodal.decode_wav(bad_fmt)
