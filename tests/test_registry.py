from network_feature_extractor_spark.config import EngineConfig
from network_feature_extractor_spark.operators.sessionize import with_session_id
from network_feature_extractor_spark.plans.registry import build_session_features


def test_registry_gates_modules(spark, turns):
    d = with_session_id(turns)

    lean = build_session_features(
        d, EngineConfig(enabled_features=("basic_metrics",))
    )
    full = build_session_features(d, EngineConfig())

    assert "len_q50" not in lean.columns
    assert "burst_count" not in lean.columns
    assert "trans_user_assistant" not in lean.columns
    assert "n_turns" in lean.columns  # core always on

    for c in ("len_q50", "burst_count", "total_idle_time",
              "trans_user_assistant", "seq_complexity", "has_handshake"):
        assert c in full.columns, c

    # row parity: one row per session either way
    assert lean.count() == full.count()


def test_registry_left_joins_preserve_sessions(spark, turns):
    d = with_session_id(turns)
    full = build_session_features(d, EngineConfig())
    core_rows = d.select("conv_id", "session_id").distinct().count()
    assert full.count() == core_rows
