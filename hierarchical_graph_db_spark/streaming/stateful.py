"""Custom stateful streaming operators (``applyInPandasWithState``).

Where watermarked windows don't fit — running per-key ledgers, custom
session logic, dedup registries — Spark's arbitrary-state API keeps one
typed state row per key in the checkpointed state store, delivered to a
pandas function per micro-batch. This is the Spark-native replacement for
the reference's "state in MongoDB via upsert" pattern: state lives WITH the
stream, exactly-once, no external store round-trip per record.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) ledger across micro-batches.

    Each batch emits the post-batch running totals for users seen in that
    batch; state persists in the checkpoint across batches (and restarts).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma double"
_EWMA_STATE_SCHEMA = "num double, den double, n bigint"
_EWMA_ALPHA = 0.3


def _update_ewma(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    num, den, n = state.get if state.exists else (0.0, 0.0, 0)
    decay = 1.0 - _EWMA_ALPHA
    frames = [pdf for pdf in pdfs]
    batch = pd.concat(frames).sort_values(["ts", "event_id"], kind="mergesort")
    for x in batch["value"].astype("float64"):
        num = x + decay * num
        den = 1.0 + decay * den
        n += 1
    state.update((num, den, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n],
         "ewma": [round(num / den, 5) if den else None]}
    )


def running_user_ewma(events: DataFrame) -> DataFrame:
    """Per-user streaming EWMA (α=0.3) — the stateful twin of
    ``operators/grouped.ewma_values``: the same num/den recursion, with the
    two accumulators carried in the checkpointed state store instead of a
    batch group. Each micro-batch sorts its own rows by event time (the
    append-in-time micro-batch contract, same as the running-totals ledger)
    and emits the post-batch EWMA per touched user. Replaying the whole
    fixture in one batch must therefore equal the batch operator's final
    row per user — pinned in tests."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_ewma,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
