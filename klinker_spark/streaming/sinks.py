"""Streaming sinks — ``foreachBatch`` writers for outputs Spark's
built-in sinks can't express (net-new vs the batch-only reference,
SURVEY §2.8).

``foreachBatch`` hands each micro-batch to ordinary batch code, so a
streaming pipeline can reuse every batch operator in the engine (e.g.
feed micro-batches of documents through a blocker) and write with full
batch-writer features (dynamic partition overwrite, arbitrary formats).

Exactly-once notes (the part people get wrong at scale):

- Spark re-runs a failed micro-batch with the SAME ``batch_id``; a sink
  is exactly-once only if the write is idempotent per batch id.
- ``parquet`` append is NOT idempotent.  :func:`write_stream_parquet`
  makes it so by routing every batch into a ``_batch_id=N`` partition
  written with dynamic partition overwrite — a replayed batch
  overwrites its own partition instead of duplicating rows.
- readers just read the root path; the ``_batch_id`` partition column
  doubles as write provenance.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = ["foreach_batch_sink", "write_stream_parquet"]


def foreach_batch_sink(
    stream: DataFrame,
    handler: Callable[[DataFrame, int], None],
    checkpoint: str,
    query_name: str = "foreach_batch_sink",
    available_now: bool = False,
) -> StreamingQuery:
    """Run ``handler(batch_df, batch_id)`` per micro-batch.

    The handler receives a plain batch DataFrame — any engine operator
    (blockers, dedup, eval) composes here.  Idempotence per batch_id is
    the handler's contract (see module docstring).
    """
    writer = stream.writeStream.foreachBatch(handler).queryName(query_name).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_stream_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Idempotent parquet sink: each micro-batch lands in its own
    ``_batch_id`` partition via dynamic partition overwrite, so batch
    replays after failure overwrite instead of duplicating (the
    standard exactly-once recipe for file sinks without a table
    format's transaction log)."""
    from pyspark.sql import functions as F

    cols = list(partition_by or [])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy(*(cols + ["_batch_id"]))
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return foreach_batch_sink(
        stream,
        write_batch,
        checkpoint,
        query_name="write_stream_parquet",
        available_now=available_now,
    )
