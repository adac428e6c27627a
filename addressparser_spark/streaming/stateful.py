"""Custom stateful streaming operator: session assembly with explicit state.

``applyInPandasWithState`` is the engine's slot for stateful logic Spark's
built-in windowed aggregations can't express: here, gap-based sessionization
(the streaming twin of the batch ``rel_sessionize`` query) where a user's
session stays OPEN across micro-batches in managed state and is emitted
exactly once when a later event proves the gap.

State per user: (last_ts_us, sess_idx, n_events, session_value). On every
micro-batch the incoming events are folded in timestamp order; an event more
than ``gap`` after the previous one CLOSES the running session (one output
row) and opens the next. Arrow-batched — the per-group fold is pandas, never
row-at-a-time Python over the whole stream.

Scale notes: state is O(active users) and keyed by user_id (hash-partitioned
by the state store); each micro-batch touches only keys present in the
batch. The trailing (still-open) session is intentionally held in state —
flush policy (event-time timeout) is a deployment choice; the operator
exposes the state-machine, tests drive it with a sentinel batch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = (
    "user_id bigint, sess_idx bigint, n_events bigint, session_value double"
)
STATE_SCHEMA = (
    "last_ts_us bigint, sess_idx bigint, n_events bigint, session_value double"
)


def _fold_sessions(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    if state.exists:
        last_ts_us, sess_idx, n_events, session_value = state.get
    else:
        last_ts_us, sess_idx, n_events, session_value = None, 0, 0, 0.0

    closed: list[tuple[int, int, int, float]] = []
    # materialize the WHOLE group before sorting: one micro-batch group
    # arrives as multiple Arrow chunks when it exceeds the batch size, and
    # chunks are not globally ordered — sorting per chunk and folding in
    # arrival order would split sessions at chunk boundaries
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts.value // 1_000)  # pandas ns -> us
            if last_ts_us is not None and ts_us - last_ts_us > gap_us:
                closed.append((user_id, sess_idx, n_events, round(session_value, 2)))
                sess_idx += 1
                n_events, session_value = 0, 0.0
            n_events += 1
            session_value += float(value)
            last_ts_us = ts_us

    state.update((last_ts_us, sess_idx, n_events, session_value))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "sess_idx", "n_events", "session_value"]
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id, event_id, ts, value) -> closed sessions.

    Emits one row per CLOSED session (a later event proved the 30-min gap);
    the running session lives in managed state across micro-batches.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
