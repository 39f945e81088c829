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

_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE, last_ts_us BIGINT"


def user_profiles(events: DataFrame) -> DataFrame:
    """events stream (user_id, ts_us, value) -> per-user running profile,
    emitted once per micro-batch per updated user (update semantics)."""

    def update(key, pdfs, state: GroupState):
        n, total, last = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_us"].max()))
        state.update((n, total, last))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
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
            ]
        )
        self.state = handle.getValueState("profile", schema)

    def handleInputRows(self, key, rows, timerValues):
        if self.state.exists():
            n, total, last = self.state.get()
        else:
            n, total, last = 0, 0.0, 0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts_us"].max()))
        self.state.update((n, total, last))
        import pandas as pd  # noqa: PLC0415

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
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
