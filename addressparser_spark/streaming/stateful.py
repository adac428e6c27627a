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

Two flush policies (the reference's batch comparator always terminates; the
streaming twin must too):

- ``event_time_timeout=False``: the trailing (still-open) session is held in
  state until a later event for the SAME user proves the gap — matches the
  batch computation exactly on the closed set, but a user who goes silent
  forever never flushes.
- ``event_time_timeout=True``: ``GroupStateTimeout.EventTimeTimeout`` + a
  watermark — once the event-time watermark passes ``last_event + gap``, the
  state times out and the trailing session is emitted WITHOUT a sentinel
  event. This is the complete operator for production streams.

Scale notes: state is O(active users) and keyed by user_id (hash-partitioned
by the state store); each micro-batch touches only keys present in the
batch; timed-out keys are removed from the store, so state is bounded by the
watermark horizon, not by all-time user cardinality.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60
# watermark delay for the timeout variant: how long out-of-order events may
# lag before the trailing-session flush may fire
WATERMARK_DELAY = "10 minutes"

OUTPUT_SCHEMA = (
    "user_id bigint, sess_idx bigint, n_events bigint, session_value double"
)
STATE_SCHEMA = (
    "last_ts_us bigint, sess_idx bigint, n_events bigint, session_value double"
)

_COLUMNS = ["user_id", "sess_idx", "n_events", "session_value"]


def _make_fold(
    set_timeout: bool,
) -> Callable[[Any, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]]:
    """Build the per-group fold. ``set_timeout=True`` arms an event-time
    timeout after each batch and flushes the trailing session when it fires."""

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        if set_timeout and state.hasTimedOut:
            # watermark passed last_event + gap with no new events for this
            # key: the running session is proven closed — emit and drop state
            last_ts_us, sess_idx, n_events, session_value = state.get
            state.remove()
            if n_events:
                yield pd.DataFrame(
                    [(user_id, sess_idx, n_events, round(session_value, 2))],
                    columns=_COLUMNS,
                )
            return

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
                # the gap compares FLOORED SECONDS, exactly like the batch
                # twin's unix_timestamp() diff (and the DuckDB oracle's
                # date_diff('second')) — a raw-microsecond compare diverges
                # one-sidedly on gaps inside (gap, gap+1) seconds when the
                # later event carries the larger fractional part
                if (
                    last_ts_us is not None
                    and ts_us // 1_000_000 - last_ts_us // 1_000_000
                    > SESSION_GAP_SECONDS
                ):
                    closed.append((user_id, sess_idx, n_events, round(session_value, 2)))
                    sess_idx += 1
                    n_events, session_value = 0, 0.0
                n_events += 1
                session_value += float(value)
                last_ts_us = ts_us

        state.update((last_ts_us, sess_idx, n_events, session_value))
        if set_timeout and last_ts_us is not None:
            # flush when the watermark proves the gap; +1s so the timeout
            # only fires once even a floored-second gap would exceed the
            # threshold (matching the closure rule above); Spark requires
            # the timestamp strictly ahead of the current watermark
            timeout_ms = max(
                (last_ts_us // 1_000_000 + SESSION_GAP_SECONDS + 1) * 1_000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=_COLUMNS)

    return fold


_fold_sessions = _make_fold(False)
_fold_sessions_timeout = _make_fold(True)


def sessionize_stream(events: DataFrame, event_time_timeout: bool = False) -> DataFrame:
    """events stream (user_id, event_id, ts, value) -> closed sessions.

    Emits one row per CLOSED session. ``event_time_timeout=False``: a session
    closes only when a later event proves the 30-min gap (trailing sessions
    stay in state). ``event_time_timeout=True``: additionally flushes each
    trailing session once the event-time watermark passes its
    ``last_event + gap`` — no sentinel batch needed.
    """
    if event_time_timeout:
        return (
            events.withWatermark("ts", WATERMARK_DELAY)
            .groupBy("user_id")
            .applyInPandasWithState(
                _fold_sessions_timeout,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
