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

__all__ = ["running_user_stats"]

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
