"""Structured Streaming tests: run the same builders on (a) a batch
frame for semantics and (b) a real file stream with a memory sink for
the streaming path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from klinker_spark.streaming.dedup import (
    streaming_dedup,
    streaming_token_blocks,
    windowed_event_counts,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    from klinker_spark.data.io import load_events

    return load_events(spark, SF_DIR)


def test_windowed_counts_batch(events):
    out = windowed_event_counts(events)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()


def test_dedup_batch(spark):
    df = spark.createDataFrame(
        [(1, "u", "click", 1.0), (2, "u", "click", 1.0), (3, "u", "view", 2.0)],
        ["event_id", "user_id", "event_type", "value"],
    ).withColumn("ts", F.current_timestamp())
    out = streaming_dedup(df)
    assert out.count() == 2


def test_streaming_end_to_end(spark, events, tmp_path):
    # feed the parquet dir as a file stream; aggregate into memory sink
    src = str(tmp_path / "stream_src")
    events.limit(2000).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    assert stream.isStreaming

    counts = windowed_event_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")  # watermark allows append
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # with availableNow + watermark, closed windows are emitted
    got = spark.sql("select sum(n_events) from win_counts").collect()[0][0]
    assert got is not None and got > 0

    blocks = streaming_token_blocks(stream)
    q2 = (
        blocks.writeStream.format("memory")
        .queryName("tok_blocks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    n = spark.sql("select count(*) from tok_blocks").collect()[0][0]
    assert n > 0


def test_streaming_dedup_stream_mode(spark, events, tmp_path):
    src = str(tmp_path / "dedup_src")
    dup = events.limit(500)
    dup.union(dup).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_dedup(stream, keys=["event_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(distinct event_id), count(*) from dedup_out").collect()[0]
    assert n[0] == n[1] == 500
