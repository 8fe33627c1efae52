"""Streaming SCD type-2 — dimension-history maintenance over a change
stream (the streaming twin of ``ops.temporal.scd2_intervals``).

One state row per dimension key holds the OPEN interval
``(value, valid_from_us, tie)``; each micro-batch processes the key's
change events in (ts, tie) order:

- value unchanged → no-op (dropped, like the batch operator),
- value changed  → the open interval closes (emitted with
  ``valid_to``) and a new one opens,
- every batch also (re-)emits the currently-open interval with NULL
  ``valid_to`` so downstream sees the live row; consumers keep the
  LATEST emission per (key, valid_from) — exactly what a foreachBatch
  MERGE into the history table does.

Ordering contract: per-key events must not arrive in an earlier batch
order than a previously applied change (the standard CDC source
guarantee); WITHIN a batch any order is fine (sorted here).  A
violation cannot corrupt silently — a change older than the open
interval's ``valid_from`` is counted in ``n_late`` state and skipped.

Scale: state is one slim tuple per key (not per version — closed
intervals leave the store immediately); the shuffle is the normal
per-key state partitioning.  At 100 TB of history the output table is
naturally bucketed by the dimension key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["streaming_scd2"]

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("value", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
        StructField("is_current", BooleanType()),
    ]
)

# (open_value, open_from_us, open_tie, n_late)
_STATE_SCHEMA = StructType(
    [
        StructField("v", StringType()),
        StructField("f", LongType()),
        StructField("t", LongType()),
        StructField("late", LongType()),
    ]
)


def streaming_scd2(
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """SCD2 over a stream of ``(key, ts, value, tie)`` change events.

    Batch frames fall through to :func:`ops.temporal.scd2_intervals`
    (same output schema, epoch-µs timestamps) so tests can assert
    stream ≡ batch on identical input.
    """
    if not changes.isStreaming:
        from ..ops.temporal import scd2_intervals

        out = scd2_intervals(changes, key_col, ts_col, value_col, tie_col)
        return out.select(
            F.col(key_col).alias("user_id"),
            F.col(value_col).cast("string").alias("value"),
            F.unix_micros("valid_from").alias("valid_from_us"),
            F.unix_micros("valid_to").alias("valid_to_us"),
            "is_current",
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        v, f, t, late = state.get if state.exists else (None, None, None, 0)
        closed = []  # (value, from, to)
        # Drain ALL Arrow chunks before sorting: applyInPandasWithState
        # may split one key's batch across chunks in arbitrary order, so
        # a per-chunk sort would misclassify an earlier-timestamped event
        # in a later chunk as cross-batch-late and silently skip it.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts_us", "tie"])
            for ts_us, tie, val in zip(pdf["ts_us"], pdf["tie"], pdf["value"]):
                ts_us, tie = int(ts_us), int(tie)
                if f is not None and (ts_us, tie) <= (f, t):
                    late += 1  # out-of-order across batches: count, skip
                    continue
                if f is None:
                    v, f, t = val, ts_us, tie
                elif val != v:
                    closed.append((v, f, ts_us))
                    v, f, t = val, ts_us, tie
        state.update((v, f, t, late))
        rows = [
            {
                "user_id": key[0],
                "value": cv,
                "valid_from_us": cf,
                "valid_to_us": cto,
                "is_current": False,
            }
            for cv, cf, cto in closed
        ]
        if f is not None:
            rows.append(
                {
                    "user_id": key[0],
                    "value": v,
                    "valid_from_us": f,
                    "valid_to_us": None,
                    "is_current": True,
                }
            )
        yield pd.DataFrame(rows)

    prepared = changes.select(
        F.col(key_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(tie_col).cast("bigint").alias("tie"),
        F.col(value_col).cast("string").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
