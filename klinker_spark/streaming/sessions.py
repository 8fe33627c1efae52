"""Sessionization — gap-based session windows over an event stream
(beyond-reference, SURVEY §2.8: the reference is batch-only).

Streaming path: ``F.session_window`` + watermark (state bounded by the
gap).  Batch path: the classic gaps-and-islands — a lag/cumsum window —
which a SQL oracle can reproduce exactly.  Both produce one row per
(user, session) with the same column names.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]

_UNIT_S = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _gap_seconds(gap: str) -> int:
    m = re.match(r"(\d+)\s*(second|minute|hour|day)s?", gap.strip())
    if not m:
        raise ValueError(f"unparseable gap: {gap!r}")
    return int(m.group(1)) * _UNIT_S[m.group(2)]


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Group events into sessions separated by ≥ ``gap`` of inactivity.

    Output: ``(user_id, session_start_ms, session_end_ms, n_events)``.
    """
    if events.isStreaming:
        return (
            events.withWatermark(ts_col, gap)
            .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("sw"))
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col(user_col).alias("user_id"),
                F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
                F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
                "n_events",
            )
        )

    gap_ms = _gap_seconds(gap) * 1000
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    with_flag = events.select(
        F.col(user_col).alias("user_id"), ms.alias("ts_ms")
    ).withColumn(
        "new_sess",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w)) >= gap_ms, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = with_flag.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id").orderBy("ts_ms").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count("*").alias("n_events"),
    ).drop("sess_id")
