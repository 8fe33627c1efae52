"""Streaming sketch maintenance — continuous distinct-count tracking.

The batch HLL (:mod:`klinker_spark.ops.sketches`) is mergeable by
per-bucket register max; here that split runs against a STREAM: each
micro-batch writes its own m-row register table under
``store/batch=N`` (an idempotent batch-keyed overwrite — the
at-least-once contract every foreachBatch sink in this engine
follows), and the estimate is a max-merge over all batches read at
ask time.  State per tracked scope is ``m`` rows per batch — never
the key space — and compacting old batches into one is itself just
the merge (run :func:`~klinker_spark.ops.layout.compact_small_files`
or re-write the merged table on a cadence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.sketches import hll_estimate, hll_registers

__all__ = [
    "streaming_distinct_tracker",
    "tracked_distinct_estimate",
    "streaming_frequency_tracker",
    "tracked_frequency_sketch",
]


def streaming_distinct_tracker(
    stream: DataFrame,
    col: str,
    store_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """ForeachBatch writer: per micro-batch, the batch's HLL register
    table lands at ``store_dir/batch=N`` (overwrite — replays of the
    same batch id are idempotent).  Returns the started query."""

    def per_batch(batch_df, batch_id: int) -> None:
        hll_registers(batch_df, col).coalesce(1).write.mode("overwrite").parquet(
            f"{store_dir}/batch={batch_id}"
        )

    writer = stream.writeStream.foreachBatch(per_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tracked_distinct_estimate(spark: SparkSession, store_dir: str) -> DataFrame:
    """Max-merge every batch's registers and estimate — EXACTLY the
    sketch a single batch pass over the union would produce (register
    max is associative/commutative/idempotent, so replays and batch
    boundaries cannot change the answer)."""
    regs = (
        spark.read.parquet(store_dir)
        .groupBy("bucket")
        .agg(F.max("mj").cast("int").alias("mj"))
    )
    return hll_estimate(regs)


def streaming_frequency_tracker(
    stream: DataFrame,
    col: str,
    store_dir: str,
    width: int = 8192,
    depth: int = 4,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """ForeachBatch writer for continuous FREQUENCY tracking: each
    micro-batch's Count-Min sketch lands at ``store_dir/batch=N``
    (idempotent batch-keyed overwrite).  Count-Min is LINEAR —
    cell-wise SUM-merge of per-batch sketches equals the single-pass
    sketch over the union — so the store never holds more than
    ``batches · depth · width`` cells regardless of the key space,
    and compaction is itself just the merge.  Returns the started
    query."""
    from ..ops.sketches import cm_build

    def per_batch(batch_df, batch_id: int) -> None:
        cm_build(batch_df, col, width=width, depth=depth).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{store_dir}/batch={batch_id}")

    writer = stream.writeStream.foreachBatch(per_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def tracked_frequency_sketch(spark: SparkSession, store_dir: str) -> DataFrame:
    """Sum-merge every batch's CM cells — EXACTLY the sketch one batch
    pass over the union would produce (cell-wise addition is the CM
    merge; replays of a batch id overwrite, so at-least-once delivery
    cannot double-count)."""
    return (
        spark.read.parquet(store_dir)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
