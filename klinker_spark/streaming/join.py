"""Stream-stream interval join — the attribution join ("purchase
within H of a click, same user") as a watermarked Structured Streaming
stream-stream join, the last classic streaming shape the engine's §2.8
family lacked (beyond-reference; the reference is batch-only).

Streaming path: both sides watermarked; the join condition carries the
event-time bounds, so Spark's state store drops a buffered left row as
soon as the watermark passes ``left.ts + horizon`` — state is bounded
by ``watermark + horizon``, never the stream length.  Batch path: the
identical condition as a plain range join (banded at scale through
``ops.temporal.range_join`` when the horizon is small relative to the
time span), which a SQL oracle reproduces exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sessions import _gap_seconds

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join each left event to every right event of the same key with
    ``right.ts ∈ [left.ts, left.ts + horizon]`` (inclusive bounds —
    simultaneous events match).

    Output: ``(key, left_id, right_id, lag_ms)`` with ``lag_ms`` the
    event-time gap — one row per qualifying pair, inner join.  Both
    inputs need ``(event_id, ts, key_col)``.

    On streaming inputs both sides are watermarked and the interval
    bound rides in the join condition (required for state cleanup); on
    batch inputs the same plan runs as a range join.
    """
    horizon_s = _gap_seconds(horizon)
    lf = left.select(
        F.col(key_col).alias("key"),
        F.col("event_id").alias("left_id"),
        F.col(ts_col).alias("lts"),
    )
    rf = right.select(
        F.col(key_col).alias("key"),
        F.col("event_id").alias("right_id"),
        F.col(ts_col).alias("rts"),
    )
    if left.isStreaming or right.isStreaming:
        lf = lf.withWatermark("lts", watermark)
        rf = rf.withWatermark("rts", watermark)
    cond = (
        (lf["key"] == rf["key"])
        & (rf["rts"] >= lf["lts"])
        & (rf["rts"] <= lf["lts"] + F.expr(f"INTERVAL {horizon_s} SECONDS"))
    )
    # cast("timestamp") is a no-op for TIMESTAMP and a session-tz
    # reinterpretation for TIMESTAMP_NTZ parquet (both sides shift
    # identically, and lag is a DIFFERENCE — unaffected); unix_micros
    # itself rejects NTZ input
    def _us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    return lf.join(rf, cond, "inner").select(
        lf["key"],
        "left_id",
        "right_id",
        ((_us("rts") - _us("lts")) / 1000).cast("bigint").alias("lag_ms"),
    )
