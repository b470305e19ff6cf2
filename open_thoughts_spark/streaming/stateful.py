"""Custom stateful streaming operator: per-conversation running state.

The north-star calls out ``applyInPandasWithState`` for custom stateful
operators. This module implements a per-conversation incremental quality
accumulator: for each conv_id the state carries (turns_seen, turns_kept,
last_turn_idx) and every trigger emits the updated conversation summary —
the streaming analog of the batch conv-stats aggregation, with bounded
per-key state and timeout-based eviction for dead conversations.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "turns_seen long, turns_kept long, last_turn_idx int"
OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, turns_kept long, last_turn_idx int, closed boolean"
)


def _make_update_fn(idle_timeout_ms: int | None):
    def _update_conv_state(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            seen, kept, last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"conv_id": conv_id, "turns_seen": seen, "turns_kept": kept,
                  "last_turn_idx": last, "closed": True}]
            )
            return
        seen, kept, last = state.get if state.exists else (0, 0, -1)
        for pdf in pdfs:
            seen += len(pdf)
            kept += int(pdf["keep"].sum())
            if len(pdf):
                last = max(last, int(pdf["turn_idx"].max()))
        state.update((seen, kept, last))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"conv_id": conv_id, "turns_seen": seen, "turns_kept": kept,
              "last_turn_idx": last, "closed": False}]
        )

    return _update_conv_state


def conversation_state_stream(
    decided_stream: DataFrame, idle_timeout_ms: int | None = 60 * 60 * 1000
) -> DataFrame:
    """Apply the stateful accumulator to a stream carrying
    (conv_id, turn_idx, keep). Output: running per-conversation summaries.

    ``idle_timeout_ms`` evicts conversations idle for that long (emitting a
    final ``closed=True`` row). Pass None for no eviction — required for
    drain-and-stop (availableNow) runs, where a pending processing-time
    timeout keeps the query alive indefinitely.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        decided_stream.select("conv_id", "turn_idx", "keep")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
