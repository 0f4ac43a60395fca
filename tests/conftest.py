from __future__ import annotations

import pandas as pd
import pytest

from network_feature_extractor_spark.datagen import generate_snapshots, generate_turns
from network_feature_extractor_spark.session import get_spark

N_CONVS = 60


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def turns(spark):
    df = generate_turns(spark, N_CONVS).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def snapshots(spark):
    df = generate_snapshots(spark, N_CONVS).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def turns_pd(turns) -> pd.DataFrame:
    pdf = turns.toPandas()
    return pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


@pytest.fixture(scope="session")
def micro_turns(spark):
    """The conftest-handshake analog (FIXTURES.md §1): one conversation,
    ts offsets 0.0/0.1/0.2, roles user/assistant/user, lens 64/64/52."""
    from datetime import datetime

    rows = [
        ("c0", 0, "user", "x" * 64, None, datetime(2024, 1, 1, 0, 0, 0)),
        ("c0", 1, "assistant", "y" * 64, "search", datetime(2024, 1, 1, 0, 0, 0, 100000)),
        ("c0", 2, "user", "z" * 52, None, datetime(2024, 1, 1, 0, 0, 0, 200000)),
    ]
    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    return spark.createDataFrame(rows, schema=TURNS_SCHEMA)
