"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming operators (SURVEY.md §2.11); this is the
extension point for semantics Spark's built-in stateful ops can't express.
Demonstrated operator: per-user session tracker — running event count,
running value sum, and session count where a session closes after a gap of
``session_gap`` seconds (the arrival-order analogue of session windows, but
with arbitrary per-group state the built-in session window can't carry).

Arrow-batched (applyInPandasWithState), not row-at-a-time; state is one
tuple per user, evicted via processing-time timeout.

Value mass accumulates as ORDER-FREE fixed-point (Σ floor(value·100) as
int64), never a float running sum: integer addition commutes exactly, so
the emitted total is bit-identical regardless of batch split or arrival
order — which is what lets the one-shot replay be checked against a plain
batch SQL oracle. Callers divide total_value_fp by 100 for display.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("events", T.LongType()),
        T.StructField("total_value_fp", T.LongType()),
        T.StructField("sessions", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events", T.LongType()),
        T.StructField("total_value_fp", T.LongType()),
        T.StructField("sessions", T.LongType()),
    ]
)


def _track(key, pdf_iter, state: GroupState):
    if state.hasTimedOut:
        state.remove()
        return
    events, total_fp, sessions, last_us = (
        state.get if state.exists else (0, 0, 0, None)
    )
    gap_us = 30 * 60 * 1_000_000
    # a group arrives as an ITERATOR of Arrow chunks in shuffle order;
    # last_ts carries across chunks, so sorting per chunk is NOT enough —
    # concat then sort once, or a group straddling a chunk boundary
    # under-counts sessions vs the batch-replay oracle
    chunks = list(pdf_iter)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        for t in ts_us:
            if last_us is None or t - last_us > gap_us:
                sessions += 1
            last_us = t
        events += len(pdf)
        # floor(v*100) per element then integer sum: exact, order-free,
        # and replayable as SUM(CAST(floor(value*100) AS BIGINT)) in SQL
        total_fp += int(
            np.floor(pdf["value"].fillna(0.0).to_numpy() * 100.0)
            .astype("int64")
            .sum()
        )
    state.update((events, total_fp, sessions, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "events": [events],
            "total_value_fp": [total_fp],
            "sessions": [sessions],
        }
    )


def user_session_stats(
    events: DataFrame, *, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Streaming per-user session statistics (update-mode output).

    Pass ``GroupStateTimeout.ProcessingTimeTimeout`` on a continuous
    trigger to let idle users' state expire; with Trigger.AvailableNow a
    processing-time timeout keeps the query alive waiting for wall-clock
    expiry, so the one-shot path defaults to NoTimeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
