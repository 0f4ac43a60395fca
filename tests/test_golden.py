"""Golden-snapshot regression test (SURVEY.md §5.4): the per-turn feature
vector for the seed-42 fixture is pinned to a checked-in CSV. Any
unintended semantic drift in windows/sessionization/as-of shows up as a
diff here even if the differential oracles are updated in lockstep.

On first run the golden file is materialized; afterwards it must match
to 1e-6. Regenerate deliberately with REGEN_GOLDEN=1.
"""

import os

import numpy as np
import pandas as pd

from network_feature_extractor_spark.config import EngineConfig
from network_feature_extractor_spark.datagen import generate_turns
from network_feature_extractor_spark.plans.pipeline import run_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "per_turn_seed42.csv")

NUM_COLS = [
    "session_id", "iat", "iat_role", "rt_len_mean", "rt_len_std",
    "rt_len_min", "rt_len_max", "cnt_user_todate", "cnt_assistant_todate",
    "pattern_hit", "prev_n_turns", "prev_total_text_len", "prev_iat_mean",
    "prev_len_q50", "asof_ts",
]


def _compute(spark) -> pd.DataFrame:
    turns = generate_turns(spark, 25)
    enriched, _ = run_pipeline(turns, EngineConfig(asof_hot_threshold=40))
    cols = ["conv_id", "turn_idx"] + NUM_COLS
    pdf = (
        enriched.select(*cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pdf


def test_golden_per_turn_snapshot(spark):
    got = _compute(spark)
    if not os.path.exists(GOLDEN) or os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        got.to_csv(GOLDEN, index=False)
    exp = pd.read_csv(GOLDEN)
    assert len(got) == len(exp)
    assert (got["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()
    for c in NUM_COLS:
        g = got[c].astype(float).to_numpy()
        e = exp[c].astype(float).to_numpy()
        both_nan = np.isnan(g) & np.isnan(e)
        ok = both_nan | np.isclose(g, e, rtol=1e-6, atol=1e-6, equal_nan=True)
        assert ok.all(), f"golden drift in {c}: {np.flatnonzero(~ok)[:5]}"
