"""Structured Streaming operators — net-new capability beyond the
reference, which is batch-only (SURVEY §2.8): streaming dedup and
windowed aggregation over an event stream.

Each builder takes an *unbounded* DataFrame (``spark.readStream``) and
returns the transformed streaming DataFrame; callers pick the sink.
The same functions accept a batch DataFrame for oracle testing — the
transformations are identical, which is the point of Structured
Streaming's unified model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "streaming_dedup",
    "windowed_event_counts",
    "streaming_token_blocks",
    "incremental_new_docs",
]


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events within the watermark horizon.

    State is bounded by the watermark (`dropDuplicatesWithinWatermark`
    — late duplicates beyond it are accepted as new, the standard
    at-scale tradeoff).  On a batch frame falls back to plain
    ``dropDuplicates`` for oracle comparison.
    """
    keys = keys or ["user_id", "event_type", "value"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window per-type counts/sums with late-data watermark.

    Output: ``(window_start, event_type, n_events, sum_value)``.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def streaming_token_blocks(
    events: DataFrame,
    ts_col: str = "ts",
    text_col: str = "props",
    id_col: str = "event_id",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window token blocking over a text column: within each
    window, events sharing a token form a block (the TokenBlocker A1
    aggregate under a stream window).

    Output: ``(window_start, token, ids array)``.
    """
    from ..functions.text import tokenize

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    toks = src.select(
        F.col(ts_col), F.col(id_col).alias("id"), F.explode(tokenize(text_col, 1)).alias("token")
    )
    return (
        toks.groupBy(F.window(F.col(ts_col), window).alias("w"), "token")
        .agg(F.collect_set("id").alias("ids"))
        .select(F.col("w.start").alias("window_start"), "token", "ids")
    )


def incremental_new_docs(
    docs: DataFrame,
    history_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Incremental corpus ingestion: from a document stream, pass only
    docs whose content fingerprint is NOT in the static history table —
    the "don't re-ingest what the corpus already has" gate every
    continuously-updated training corpus runs.

    ``history_fingerprints``: a static (batch) DataFrame with column
    ``fp_col`` — typically the md5 fingerprints of the existing corpus
    read from its metadata parquet.  Streaming-static left-anti joins
    are stateless (no watermark needed; the static side broadcasts or
    hash-joins per micro-batch), so state does NOT grow with the
    stream.  Within-stream duplicates pass through here — chain
    ``streaming_dedup``-style ``dropDuplicates`` on the fingerprint
    with a watermark when the stream itself repeats content.

    Output: the input docs plus a ``fingerprint`` column, filtered to
    unseen content.  Works identically on a batch frame (same plan,
    bounded input) for oracle testing.
    """
    fp = docs.withColumn(fp_col, F.md5(F.col(text_col)))
    hist = history_fingerprints.select(F.col(fp_col))
    return fp.join(hist, fp_col, "left_anti")
