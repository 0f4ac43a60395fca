import pytest

from network_feature_extractor_spark.config_yaml import ConfigError, load_config


def _write(tmp_path, text):
    p = tmp_path / "config.yaml"
    p.write_text(text)
    return str(p)


def test_reference_shaped_config(tmp_path):
    path = _write(
        tmp_path,
        """
features:
  basic_metrics: {enabled: true}
  packet_length: {enabled: true}
  timing_metrics: {enabled: false}
  flag_analysis: {enabled: true}
  advanced_stats: {enabled: true}
protocols:
  user: {enabled: true, timeout: 120}
  assistant: {enabled: true}
  system: {enabled: false}
""",
    )
    cfg = load_config(path)
    assert "timing_metrics" not in cfg.enabled_features
    assert "transition_analysis" in cfg.enabled_features
    assert "text_length" in cfg.enabled_features
    assert cfg.session_gap_s == 120.0
    assert cfg.enabled_roles == ("user", "assistant")


def test_unknown_section_rejected(tmp_path):
    with pytest.raises(ConfigError):
        load_config(_write(tmp_path, "bogus: {a: 1}"))


def test_unknown_feature_rejected(tmp_path):
    with pytest.raises(ConfigError):
        load_config(_write(tmp_path, "features:\n  nonsense: {enabled: true}"))


def test_invalid_timeout_rejected(tmp_path):
    with pytest.raises(ConfigError):
        load_config(_write(tmp_path, "protocols:\n  user: {timeout: -5}"))


def test_defaults_on_empty(tmp_path):
    cfg = load_config(_write(tmp_path, ""))
    assert cfg.session_gap_s == 300.0
    assert "basic_metrics" in cfg.enabled_features


def test_engine_overrides(tmp_path):
    cfg = load_config(
        _write(tmp_path, "engine:\n  rolling_k: 9\n  checkpoint_buckets: 8")
    )
    assert cfg.rolling_k == 9 and cfg.checkpoint_buckets == 8


def test_unknown_engine_key_rejected(tmp_path):
    with pytest.raises(ConfigError):
        load_config(_write(tmp_path, "engine:\n  roling_k: 9"))


def test_sampling_config(tmp_path):
    cfg = load_config(
        _write(tmp_path, "network:\n  sampling:\n    enabled: true\n    rate: 0.25")
    )
    assert cfg.sample_rate == 0.25
    off = load_config(
        _write(tmp_path, "network:\n  sampling:\n    enabled: false\n    rate: 0.25")
    )
    assert off.sample_rate == 1.0
    with pytest.raises(ConfigError):
        load_config(_write(tmp_path, "network:\n  sampling:\n    enabled: true\n    rate: 7"))
