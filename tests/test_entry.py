"""Mirror of the driver's correctness harness: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            try:
                df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ALL = sorted(entrymod.queries().keys())
WITH_ORACLE = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_duckdb_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    got = _canon(qfn(spark, SF_DIR).toPandas())
    exp = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g):
            ok = np.allclose(
                g.to_numpy(), e.to_numpy(), rtol=1e-6, atol=1e-6, equal_nan=True
            )
        else:
            ok = (g.fillna("<na>") == e.fillna("<na>")).all()
        assert ok, f"{name}: value mismatch in column {c}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(WITH_ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() > 0, name


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert out.count() > 0
    assert "session_id" in out.columns and "asof_ts" in out.columns


def test_driver_window_rotation_invariant():
    """The grading driver checks only the FIRST 50 catalog entries. The
    rotation policy requires: (a) at most 50 entries outside
    _ROTATED_TO_TAIL (else something silently loses its CORRECTNESS
    row), (b) the tail holds only entries that DO have an oracle and
    were stable before (every tail entry must still exist)."""
    from network_feature_extractor_spark.plans import driver_queries as dq

    names = list(entrymod.queries())
    tail = dq._ROTATED_TO_TAIL
    assert len(names) - len(tail) <= 50, (
        f"{len(names) - len(tail)} entries outside the tail exceed the "
        "driver's 50-query window — rotate more stable entries to "
        "_ROTATED_TO_TAIL (plans/driver_queries.py)"
    )
    assert names[-len(tail):] == tail  # rotation actually applied
    for t in tail:
        assert t in entrymod.oracle_sql(), t  # only oracled, stable entries

    # (c) tail entries must be UNCHANGED since rotation (r3 ADVICE): a
    # tail entry's recorded source hash (function source + oracle SQL,
    # captured at rotation time) must still match — any edit to a
    # rotated-out query or its oracle fails here, forcing the entry back
    # into the first-50 window so the change gets a driver row.
    import hashlib
    import inspect

    assert set(tail) == set(dq._TAIL_SOURCE_HASHES), (
        "every tail entry needs a recorded source hash"
    )
    for t in tail:
        src = inspect.getsource(dq.QUERIES[t]) + dq.ORACLES.get(t, "")
        got = hashlib.md5(src.encode()).hexdigest()
        assert got == dq._TAIL_SOURCE_HASHES[t], (
            f"{t} changed since rotation to the tail — move it back into "
            "the driver window (and swap a stable entry out)"
        )
