"""M6 — custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (its closest construct is a
polling file sensor, learn/dag_minio_test.py:18-23); native
``session_window`` covers the built-in windowed case (see workload
``events_session_window``). This module is the *extension* path the
engine sanctions for stateful logic Spark's operators can't express:
arbitrary per-key state machines, written as Arrow-batched pandas
functions over ``applyInPandasWithState``.

The shipped example is gap-based sessionization as a state machine:
one open session per user lives in the state store; events extend or
close it, and the event-time timeout closes idle sessions when the
watermark passes ``last_event + gap`` — so a session is emitted exactly
once, whether it is closed by a later event or by silence. This is the
canonical shape for per-entity trackers at 100 TB scale: state is
O(active keys), each micro-batch shuffles only its own events by key,
and the state store handles persistence/recovery.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def _session_schema(events: DataFrame, key_col: str) -> StructType:
    """Output schema with the key column's type copied from the input
    (user ids are strings in the reference fixtures, bigints in the
    events test table — the operator shouldn't care)."""
    key_field = events.schema[key_col]
    return StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
        ]
    )

# one open session per key: (start_us, last_us, n_events)
_STATE_SCHEMA = "start_us LONG, last_us LONG, n LONG"


def _sessionize_fn(gap_us: int, key_col: str):
    cols = [key_col, "session_start_us", "session_end_us", "n_events"]

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[Any, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new events:
            # the open session is over
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
            yield pd.DataFrame(closed, columns=cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"])

        cur = state.get if state.exists else None  # (start, last, n)
        for ts in batch["ts_us"]:
            ts = int(ts)
            if cur is None:
                cur = (ts, ts, 1)
            elif ts - cur[1] > gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = (ts, ts, 1)
            else:
                cur = (cur[0], max(cur[1], ts), cur[2] + 1)

        state.update(cur)
        # close by silence: when the watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        yield pd.DataFrame(closed, columns=cols)

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization over an events stream carrying
    ``user_id``, ``event_id``, ``ts_us`` (integer event-time µs) and
    ``ts_utc`` (timestamp mirror of ts_us, used for the watermark).

    Emits one row per *completed* session (append semantics): a session
    completes when a later event for the same user arrives more than
    ``gap_minutes`` after its last event, or when the watermark passes
    that point with no event at all (event-time timeout). Sessions
    still open when the query stops stay in the state store and are
    emitted on a later trigger — exactly-once, resumable semantics.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts_utc", watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _sessionize_fn(gap_us, key_col),
            outputStructType=_session_schema(events, key_col),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _journey_schema(events: DataFrame, key_col: str) -> StructType:
    from pyspark.sql.types import StringType

    key_field = events.schema[key_col]
    return StructType(
        [
            StructField(key_col, key_field.dataType),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
            StructField("journey", StringType()),
        ]
    )


_JOURNEY_STATE_SCHEMA = "start_us LONG, last_us LONG, n LONG, journey STRING"


def _journey_fn(gap_us: int, key_col: str):
    cols = [key_col, "session_start_us", "session_end_us", "n_events", "journey"]

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[Any, int, int, int, str]] = []

        if state.hasTimedOut:
            start, last, n, journey = state.get
            closed.append((user_id, start, last, n, journey))
            state.remove()
            yield pd.DataFrame(closed, columns=cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"])

        cur = state.get if state.exists else None
        for ts, sym in zip(batch["ts_us"], batch["sym"]):
            ts = int(ts)
            if cur is None:
                cur = (ts, ts, 1, sym)
            elif ts - cur[1] > gap_us:
                closed.append((user_id, *cur))
                cur = (ts, ts, 1, sym)
            else:
                cur = (cur[0], max(cur[1], ts), cur[2] + 1, cur[3] + sym)

        state.update(cur)
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000 + 1)
        yield pd.DataFrame(closed, columns=cols)

    return fn


def journey_sessions_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
    key_col: str = "user_id",
) -> DataFrame:
    """The sessionizer extended into streaming SEQUENCE analytics: per
    completed session, the deterministic symbol journey (events sorted
    by ``(ts_us, event_id)`` inside each batch and appended to the
    state's accumulated string) alongside start/end/count — the
    streaming twin of ``operators/sequence.journey_pattern_counts``
    composed with sessionization. The input stream must carry a
    single-character ``sym`` column (build it with
    ``operators.sequence.symbolize``).

    Same emission contract as :func:`sessionize_stateful`: a session's
    journey is emitted exactly once — closed by a later event past the
    gap, or by the event-time timeout when the watermark passes
    ``last + gap``. State is one open session per key
    (O(active keys) plus the open session's journey string — bounded
    by session length, the same bound the gap guarantees). Ordering
    caveat shared with every reorder-buffer-free event-time state
    machine: events arriving across micro-batch boundaries out of
    event-time order would append out of order; a true late-data
    deployment puts a watermark-deep sort buffer upstream. Pattern
    counting stays OUTSIDE the state machine — emitted journeys are
    plain strings, so the JVM ``regexp_count`` runs on the sink side
    exactly as in the batch operator."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts_utc", watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            _journey_fn(gap_us, key_col),
            outputStructType=_journey_schema(events, key_col),
            stateStructType=_JOURNEY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
