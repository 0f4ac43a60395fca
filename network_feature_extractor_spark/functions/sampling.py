"""Deterministic sampling (SURVEY.md §2.2 P4).

The reference samples per packet kernel-side with a PRNG
(``ebpf/packet_capture.c:149-175``, rate from ``config/config.yaml:7-9``).
A distributed engine wants the sample to be DETERMINISTIC (re-runs and
oracle checks see the same subset), so the coin flip is a hash
comparison: keep a row iff the first 8 hex chars of md5(key) fall below
``rate * 16^8``. Uniform (md5), reproducible in any SQL engine, and a
pure pushdown-friendly filter — no RNG state, no seed plumbing.

The sampled unit is the hash key: hashing a conversation id keeps or
drops whole conversations (sequence-preserving — the right default for
transcript pipelines); hashing a row-unique turn id reproduces the
reference's lossy per-packet semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8


def sample_bound(rate: float) -> str:
    """Hex threshold such that P(md5-prefix < bound) == rate (to 1/16^8)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(int(rate * 16**_HEX_DIGITS), f"0{_HEX_DIGITS}x")


def keep_expr(key: Column, rate: float) -> Column:
    """Boolean keep-column for a deterministic ``rate`` sample on key."""
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS) < sample_bound(rate)


def deterministic_sample(df: DataFrame, rate: float, key_col: str) -> DataFrame:
    """Keep ~``rate`` of distinct ``key_col`` values. The mode is the
    key choice: a conversation id samples whole conversations ("conv"
    mode, the sequence-preserving default); a row-unique id (turn id)
    reproduces the reference's per-packet semantics ("turn" mode)."""
    if rate >= 1.0:
        return df
    return df.filter(keep_expr(F.col(key_col), rate))
