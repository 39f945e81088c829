"""Custom stateful streaming operator via ``applyInPandasWithState``.

The engine's example of arbitrary per-key streaming state beyond what
windows/dropDuplicates express: a running per-user event profile
(count, value sum, last event time) maintained across micro-batches in
managed state. This is the ``applyInPandasWithState`` pattern a
production pipeline uses for custom sessionization, rate limiting, or
feature accumulation.

Scale shape: state is partitioned by the grouping key (one shuffle on
``user_id``), updated with Arrow-batched pandas groups, snapshotted by
the checkpoint, and bounded by key cardinality - not history length.
The closure is self-contained (value-pickled): workers never import
this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_STATE_SCHEMA = (
    "n_events BIGINT, total_value DOUBLE, last_ts_us BIGINT, "
    "n_vals BIGINT"
)


def user_profiles(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts_us, value) -> per-user running profile,
    emitted once per micro-batch per updated user (update semantics)."""

    def update(key, pdfs, state: GroupState):
        n, total, last, n_vals = (
            state.get if state.exists else (0, 0.0, 0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            # SQL-SUM null semantics: pandas .sum() skips NaN but
            # returns 0.0 for an ALL-NaN series where SQL SUM is NULL
            # (r13 partial-records census) - track the non-null count
            # so an all-missing profile reports a NULL total.
            total += float(pdf["value"].sum())
            n_vals += int(pdf["value"].notna().sum())
            last = max(last, int(pdf["ts_us"].max()))
        state.update((n, total, last, n_vals))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total if n_vals > 0 else None],
                "last_ts_us": [last],
            }
        )

    # "append" output mode: each emitted snapshot row is final for its
    # micro-batch, which is what an append-only (file) sink requires;
    # readers take the row with the max last_ts_us per user for the
    # current profile. ("update" mode would need an update-capable sink.)
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas flavor (the Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class ProfileProcessor(StatefulProcessor):
    """Per-user running profile on the ``transformWithState`` API -
    Spark 4's successor to applyInPandasWithState: named state
    variables on an explicit handle (here one ValueState; the API
    adds ListState/MapState and timers), ``handleInputRows`` per key
    per micro-batch, emitted rows as pandas frames. Same semantics as
    :func:`user_profiles`, so the two APIs can be compared
    operator-for-operator."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = T.StructType(
            [
                T.StructField("n_events", T.LongType()),
                T.StructField("total_value", T.DoubleType()),
                T.StructField("last_ts_us", T.LongType()),
                T.StructField("n_vals", T.LongType()),
            ]
        )
        self.state = handle.getValueState("profile", schema)

    def handleInputRows(self, key, rows, timerValues):
        if self.state.exists():
            n, total, last, n_vals = self.state.get()
        else:
            n, total, last, n_vals = 0, 0.0, 0, 0
        for pdf in rows:
            n += len(pdf)
            # SQL-SUM null semantics (same device as user_profiles):
            # an all-missing profile reports a NULL total, not 0.0
            total += float(pdf["value"].sum())
            n_vals += int(pdf["value"].notna().sum())
            last = max(last, int(pdf["ts_us"].max()))
        self.state.update((n, total, last, n_vals))
        import pandas as pd  # noqa: PLC0415

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total if n_vals > 0 else None],
                "last_ts_us": [last],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts_us, value) -> per-user running
    profile via ``transformWithStateInPandas``; append emission as in
    :func:`user_profiles` (file sinks are append-only)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=PROFILE_SCHEMA,
        outputMode="append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# timeout-driven sessionization (event-time timers on managed state)
# ---------------------------------------------------------------------------

#: session gap, microseconds (matches q70/q212's 30 minutes).
SESSION_GAP_US = 1_800_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = "start_us BIGINT, last_us BIGINT, n BIGINT"


def timeout_sessions(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts_us, event_time watermarked) ->
    finalized 30-min-gap sessions, closed EITHER by an in-batch gap
    OR by an EVENT-TIME TIMEOUT on the managed state - the timer
    mechanism ``session_window`` (q212) hides, driven explicitly: the
    open session arms a timer at last_event + gap; when the watermark
    passes it, the state times out and the session flushes. Same
    emission rule as q212 (append once end <= watermark), reached by
    the custom-operator machinery a non-session stateful design
    (abandoned carts, SLA breach timers, heartbeat loss) actually
    needs."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        gap = SESSION_GAP_US
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "session_end_us": [last + gap],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts_us", "event_id"]
        )
        closed = []
        cur = state.get if state.exists else None  # (start, last, n)
        for ts in rows["ts_us"]:
            ts = int(ts)
            if cur is None:
                cur = (ts, ts, 1)
            elif ts - cur[1] > gap:
                closed.append(cur)
                cur = (ts, ts, 1)
            else:
                cur = (cur[0], ts, cur[2] + 1)
        state.update(cur)
        # arm the event-time timer: fire when the watermark passes the
        # open session's end (timestamp is MILLISECONDS)
        state.setTimeoutTimestamp((cur[1] + gap) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] + gap for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
