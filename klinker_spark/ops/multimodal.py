"""Multimodal columns — image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``
stages (SURVEY §7 milestone 5).

The Spark-side plumbing (schemas, batch shapes, partition-preserving
iterator transforms) is real and tested; the codec kernels themselves
are STUBBED — the decode libraries (PIL/ffmpeg/torchaudio) are not in
this container.  ``decode_fn=None`` selects a deterministic fake
(hash-derived features) so pipelines are runnable end-to-end; passing a
real decoder is a one-argument change and touches no plan shape.

Design for 100 TB of media: binary payloads never pass through Python
row-at-a-time — each ``mapInPandas`` batch moves via Arrow; metadata
predicates (``media_type``, ``n_bytes``) are ordinary columns so
Catalyst prunes and pushes down before any decode runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "pack_media",
    "extract_features",
    "sample_frames",
    "resize_media",
]

#: Canonical multimodal table layout: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)


def pack_media(
    df: DataFrame, id_col: str, payload_col: str, media_type: str, meta_col: str | None = None
) -> DataFrame:
    """Normalize any (id, binary) table into the canonical media layout."""
    meta = F.col(meta_col) if meta_col else F.lit(None).cast("string")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        meta.alias("meta"),
    )


def _fake_features(payload: pd.Series, dim: int) -> pd.Series:
    """Deterministic stand-in for a real feature extractor: dim floats
    derived from the payload bytes.  Replace with a model forward pass
    (same signature) for real use."""

    def one(b) -> list[float]:
        if b is None:
            return [0.0] * dim
        h = int.from_bytes(bytes(b)[:8].ljust(8, b"\0"), "little")
        return [((h >> (i % 56)) % 1000) / 1000.0 for i in range(dim)]

    return payload.map(one)


def extract_features(
    media: DataFrame, dim: int = 8, decode_fn=None, batch_hint: int | None = None
) -> DataFrame:
    """Media table → ``(media_id, media_type, features array<float>)``
    via Arrow-batched ``mapInPandas`` (M4/M5 strategy: the same stage
    shape that hosts a transformer encoder on GPU executors).

    ``decode_fn(payload_series) -> Series[list[float]]``; None selects
    the deterministic fake.  A real decoder that needs native libs
    should raise ``NotImplementedError`` where unavailable — the stub
    boundary is the function, never the plan.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    fn = decode_fn or (lambda s: _fake_features(s, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": fn(pdf["payload"]),
                }
            )

    from ..session import widen_for_kernel

    cols = widen_for_kernel(media.select("media_id", "media_type", "payload"))
    return cols.mapInPandas(run, schema=out_schema)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (UDTF shape).  The decoder is stubbed — frame payloads are
    byte slices standing in for decoded frames; ffmpeg drops into
    ``run`` with the same (media_id, frame_idx, frame) contract.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n = min(max_frames, max(len(b) // every_n_bytes, 1))
                for i in range(n):
                    rows.append((mid, i, b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    from ..session import widen_for_kernel

    return widen_for_kernel(
        media.where(F.col("media_type") == "video").select("media_id", "payload")
    ).mapInPandas(run, schema=out_schema)


def resize_media(
    media: DataFrame, target_bytes: int = 512, resize_fn=None
) -> DataFrame:
    """Image/audio resize plumbing: payload → smaller payload with
    updated byte metadata, preserving the canonical media layout so
    downstream stages (feature extraction, frame sampling) compose
    unchanged.

    ``resize_fn(payload_series, target_bytes) -> Series[bytes]`` is the
    kernel seam — a real implementation decodes, resizes (PIL
    ``thumbnail`` / audio resample), and re-encodes; the deterministic
    stub truncates the payload to ``target_bytes`` (shape-faithful:
    output is a valid, smaller binary column).  Arrow-batched
    ``mapInPandas``; metadata columns pass through prunable.
    """
    out_schema = MEDIA_SCHEMA

    def default_fn(payloads: pd.Series, tb: int) -> pd.Series:
        return payloads.map(lambda b: None if b is None else bytes(b)[:tb])

    fn = resize_fn or default_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = fn(pdf["payload"], target_bytes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "n_bytes": resized.map(lambda b: None if b is None else len(b)),
                    "meta": pdf["meta"],
                }
            )

    from ..session import widen_for_kernel

    return widen_for_kernel(
        media.select("media_id", "media_type", "payload", "n_bytes", "meta")
    ).mapInPandas(run, schema=out_schema)
