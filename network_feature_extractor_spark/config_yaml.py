"""YAML config loader — API parity with the reference's ``Config``
(``src/core/config.py:85-233,546``): same file shape
(``config/config.yaml``), schema-validated, with the reference's feature
keys mapped onto the engine's modules:

    features.basic_metrics / packet_length -> core + text_length module
    features.timing_metrics / active_idle  -> timing_metrics module
    features.flag_analysis                 -> transition_analysis module
    protocols.<role>.enabled/.timeout      -> enabled_roles + session gap
    network.sampling                       -> deterministic hash sample rate

Unknown keys are rejected (the reference validates section/key types);
values fall back to the same defaults the reference declares.
"""

from __future__ import annotations

from dataclasses import replace

from .config import EngineConfig

_FEATURE_MAP = {
    "basic_metrics": "basic_metrics",
    "packet_length": "text_length",
    "timing_metrics": "timing_metrics",
    "active_idle": "timing_metrics",
    "flag_analysis": "transition_analysis",
    # scaffold-only sections in the reference (no implementing module,
    # SURVEY.md §2.8) — accepted and ignored, like the reference does:
    "advanced_stats": None,
    "subflow_analysis": None,
    "window_stats": None,
}

_KNOWN_SECTIONS = {"network", "features", "protocols", "output", "monitoring", "logging", "engine"}


class ConfigError(ValueError):
    pass


def load_config(path: str) -> EngineConfig:
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ConfigError("top-level config must be a mapping")
    unknown = set(raw) - _KNOWN_SECTIONS
    if unknown:
        raise ConfigError(f"unknown config sections: {sorted(unknown)}")

    cfg = EngineConfig()

    feats = raw.get("features", {}) or {}
    enabled = set(cfg.enabled_features)
    for key, section in feats.items():
        if key not in _FEATURE_MAP:
            raise ConfigError(f"unknown feature key: {key}")
        module = _FEATURE_MAP[key]
        if module is None:
            continue
        on = bool((section or {}).get("enabled", True))
        if on:
            enabled.add(module)
        else:
            enabled.discard(module)

    protos = raw.get("protocols", {}) or {}
    roles = []
    gap = cfg.session_gap_s
    for role, sec in protos.items():
        sec = sec or {}
        if sec.get("enabled", True):
            roles.append(role)
        if "timeout" in sec:
            t = float(sec["timeout"])
            if t <= 0:
                raise ConfigError(f"protocols.{role}.timeout must be > 0")
            gap = t if role in ("tcp", "user") else gap

    net = raw.get("network", {}) or {}
    samp = net.get("sampling", {}) or {}
    rate = cfg.sample_rate
    if samp.get("enabled", False):
        rate = float(samp.get("rate", 1.0))
        if not 0.0 <= rate <= 1.0:
            raise ConfigError("network.sampling.rate must be in [0, 1]")

    eng = raw.get("engine", {}) or {}
    known_engine = {"rolling_k", "asof_hot_threshold", "checkpoint_buckets", "asof_ttl_s"}
    unknown_eng = set(eng) - known_engine
    if unknown_eng:
        raise ConfigError(f"unknown engine keys: {sorted(unknown_eng)}")
    fft = bool(((raw.get("features", {}) or {}).get("timing_metrics", {}) or {}).get("fft_enabled", cfg.fft_enabled))

    # r7 ADVICE: YAML 1.1 parses `asof_ttl_s: off`/`no` as False, which
    # is not None — float(False) = 0.0 would silently enable the MOST
    # aggressive TTL when the user meant to disable; negative values
    # would only fail deep inside pipeline build. Validate here, in the
    # file's sampling.rate style.
    ttl_raw = eng.get("asof_ttl_s")
    if isinstance(ttl_raw, bool):
        raise ConfigError(
            "engine.asof_ttl_s must be a number of seconds or absent "
            "(YAML off/no parse as booleans — delete the key to disable)"
        )
    if ttl_raw is not None and float(ttl_raw) < 0:
        raise ConfigError("engine.asof_ttl_s must be >= 0")

    return replace(
        cfg,
        enabled_features=tuple(sorted(enabled)),
        enabled_roles=tuple(roles) if roles else cfg.enabled_roles,
        session_gap_s=gap,
        sample_rate=rate,
        fft_enabled=fft,
        rolling_k=int(eng.get("rolling_k", cfg.rolling_k)),
        asof_hot_threshold=int(eng.get("asof_hot_threshold", cfg.asof_hot_threshold)),
        asof_ttl_s=(
            float(eng["asof_ttl_s"]) if eng.get("asof_ttl_s") is not None else cfg.asof_ttl_s
        ),
        checkpoint_buckets=int(eng.get("checkpoint_buckets", cfg.checkpoint_buckets)),
    )
