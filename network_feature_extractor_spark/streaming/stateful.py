"""Custom keyed streaming state via applyInPandasWithState (SURVEY.md
§2.9): the direct analog of the reference's mutable per-flow dict with
inactivity timeout (``src/core/flow_tracker.py:984-1036``).

``running_conv_state`` keeps, per conversation: turn count, total text
length, last role, and role-transition counts — updated per micro-batch
(Arrow-vectorized inside), emitted in update mode, expired on
processing-time timeout like the reference's cleanup sweep.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("total_text_len", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
        T.StructField("trans_user_assistant", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("total_text_len", T.LongType(), False),
        T.StructField("last_role", T.StringType(), True),
        T.StructField("trans_user_assistant", T.LongType(), False),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        n, tl, lr, tua = state.get
        state.remove()
        yield pd.DataFrame(
            [{"conv_id": conv_id, "n_turns": n, "total_text_len": tl,
              "last_role": lr, "trans_user_assistant": tua, "closed": True}]
        )
        return

    n, tl, lr, tua = state.get if state.exists else (0, 0, None, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        roles = pdf["role"].tolist()
        n += len(pdf)
        tl += int(pdf["text"].str.len().sum())
        seq = ([lr] if lr is not None else []) + roles
        tua += sum(
            1 for a, b in zip(seq, seq[1:]) if a == "user" and b == "assistant"
        )
        if roles:
            lr = roles[-1]
    state.update((n, tl, lr, tua))
    state.setTimeoutDuration(30_000)  # inactivity sweep analog (30 s)
    yield pd.DataFrame(
        [{"conv_id": conv_id, "n_turns": n, "total_text_len": tl,
          "last_role": lr, "trans_user_assistant": tua, "closed": False}]
    )


def running_conv_state(turns_stream: DataFrame) -> DataFrame:
    """Per-conversation running state over a stream of turns."""
    return turns_stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
