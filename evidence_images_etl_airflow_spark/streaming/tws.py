"""M6 — the SAME gap-sessionizer on Spark 4's transformWithState API.

``streaming/stateful.py`` implements per-user session tracking on
``applyInPandasWithState`` (the Spark 3.4 arbitrary-state API); this
module is the identical state machine on ``transformWithStateInPandas``
— Spark 4's successor (SPARK-49564 / the StatefulProcessor interface),
which the engine should demonstrate because new stateful operators are
supposed to be written against it: typed state handles (ValueState)
instead of one opaque tuple, EXPLICIT event-time timers instead of a
single implicit timeout slot, and multiple state variables / TTL /
initial-state support the old API lacks.

Semantics are pinned to the old operator's: one open session per user
in a ValueState; events extend or close it; a registered event-time
timer at ``last_event + gap (ms) + 1`` closes idle sessions when the
watermark passes. The workload registers BOTH operators against the
same batch-SQL oracle (``streaming_stateful_sessions`` /
``streaming_tws_sessions``), so the two state APIs are proven to agree
with the declarative formulation and with each other.

Scale shape: identical to the old API — state is O(active keys) in the
state store, each micro-batch shuffles only its own events by key.

ENVIRONMENT GATE: transformWithState's Python state server speaks
protobuf ("ImportError: cannot import name 'descriptor' from
'google.protobuf'" without it), and this build environment ships no
protobuf and forbids installs — so the operator is exercised by a
skip-gated test tier (test_sources_streaming.test_tws_sessionizer_*)
that runs wherever protobuf exists, exactly like the live-Postgres
tier gates on a JDBC driver. ``TWS_AVAILABLE`` is the probe.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from evidence_images_etl_airflow_spark.streaming.stateful import _session_schema

try:  # the TWS state-server protocol needs protobuf at runtime
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # pragma: no cover - absent in this build env
    TWS_AVAILABLE = False

# (start_us, last_us, n_events, timer_ms) — timer_ms remembered so the
# stale timer can be deleted when a new event re-arms the timeout
_VALUE_SCHEMA = "start_us LONG, last_us LONG, n LONG, timer_ms LONG"


class SessionProcessor(StatefulProcessor):
    """Gap-based sessionization as a StatefulProcessor."""

    def __init__(self, gap_us: int, key_col: str):
        self._gap_us = gap_us
        self._cols = [key_col, "session_start_us", "session_end_us", "n_events"]

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", _VALUE_SCHEMA)

    def handleInputRows(
        self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values(["ts_us", "event_id"])
        closed: list[tuple[Any, int, int, int]] = []
        cur = None
        if self._state.exists():
            start, last, n, timer_ms = self._state.get()
            cur = (start, last, n)
            # a new event re-arms the timeout: drop the stale timer
            self._handle.deleteTimer(timer_ms)
        for ts in batch["ts_us"]:
            ts = int(ts)
            if cur is None:
                cur = (ts, ts, 1)
            elif ts - cur[1] > self._gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = (ts, ts, 1)
            else:
                cur = (cur[0], max(cur[1], ts), cur[2] + 1)
        timer_ms = (cur[1] + self._gap_us) // 1000 + 1
        self._state.update((cur[0], cur[1], cur[2], timer_ms))
        self._handle.registerTimer(timer_ms)
        if closed:
            yield pd.DataFrame(closed, columns=self._cols)

    def handleExpiredTimer(
        self, key: Tuple[Any, ...], timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # watermark passed last_event + gap: the open session is over
        if self._state.exists():
            start, last, n, _ = self._state.get()
            self._state.clear()
            yield pd.DataFrame([(key[0], start, last, n)], columns=self._cols)

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
    key_col: str = "user_id",
) -> DataFrame:
    """transformWithStateInPandas twin of
    ``stateful.sessionize_stateful`` — same input contract (``ts_us``
    integer event-time µs + ``ts_utc`` timestamp mirror for the
    watermark), same append semantics, same emitted set."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withWatermark("ts_utc", watermark_delay)
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(gap_us, key_col),
            outputStructType=_session_schema(events, key_col),
            outputMode="append",
            timeMode="eventTime",
        )
    )
