"""Custom stateful streaming operators — ``applyInPandasWithState``
(net-new vs the batch-only reference, SURVEY §2.8).

Where the built-in stateful ops (windowed aggs, stream dedup,
``session_window``) don't fit, Structured Streaming's escape hatch is a
user-defined state machine per key.  The demo operator keeps running
per-user statistics across micro-batches — the shape any custom
accumulator (per-entity blocking-key history, per-document shingle
cache, per-user feature state) follows.

Scale: state lives in the executors' state store partitioned by the
grouping key — the same hash partitioning as a batch ``groupBy`` — and
Arrow batches flow through the Python worker.  State size is O(distinct
keys); evict with ``GroupStateTimeout`` when keys churn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["running_user_stats", "running_user_stats_tws"]

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts_ms bigint"
_STATE_SCHEMA = "n bigint, s double, last bigint"


def running_user_stats(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Cumulative per-user ``(n_events, sum_value, last_ts_ms)``.

    Streaming: one state row per user updated per micro-batch via
    ``applyInPandasWithState`` (update mode — each batch emits the keys
    it touched with their new running totals).  Batch frames compute
    the same totals with a plain aggregate, so tests/oracles can
    compare the final streaming state against the batch answer.
    """
    # unix_millis is exact integer math; a double round-trip can flip a
    # millisecond boundary (see data/io.py::load_events)
    ts_ms = F.unix_millis(F.col(ts_col))
    if not events.isStreaming:
        return (
            events.select("user_id", "value", ts_ms.alias("ts_ms"))
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
                F.max("ts_ms").alias("last_ts_ms"),
            )
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            if len(pdf):
                last = max(last, int(pdf["ts_ms"].max()))
        state.update((n, s, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s], "last_ts_ms": [last]}
        )

    return (
        events.select("user_id", "value", ts_ms.alias("ts_ms"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_stats_tws(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """:func:`running_user_stats` on the ``transformWithStateInPandas``
    API — Spark 4's successor to ``applyInPandasWithState``: typed
    state variables (``ValueState``/``ListState``/``MapState``) behind a
    ``StatefulProcessor`` instead of one opaque state tuple, with TTL
    and timers.  Requires the RocksDB state-store provider (set in
    ``session.get_spark``) and the ``protobuf`` package (the state
    server's wire protocol — not in this container, so the pytest
    coverage import-skips; the classic variant stays the tested path).
    Same output and update-mode semantics as the classic variant, so
    the same batch aggregate is its oracle.
    """
    ts_ms = F.unix_millis(F.col(ts_col))
    if not events.isStreaming:
        return running_user_stats(events, ts_col)

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import StructType

    state_schema = StructType.fromDDL(_STATE_SCHEMA)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, s, last = self._agg.get() if self._agg.exists() else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                if len(pdf):
                    last = max(last, int(pdf["ts_ms"].max()))
            self._agg.update((n, s, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_ts_ms": [last],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value", ts_ms.alias("ts_ms"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStats(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
