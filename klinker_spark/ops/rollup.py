"""Hypertable rollup — hierarchical multi-granularity time-bucket
aggregates (the TimescaleDB continuous-aggregate pattern; a brief-named
net-new operator, no reference counterpart).

The raw table is scanned ONCE, for the finest granularity; every
coarser level aggregates the next finer level's PARTIALS (count, sum,
min, max all compose; avg derives as sum/count).  At 100 TB that is
the difference between one raw scan + tiny rollup-of-rollup jobs and
one full scan per granularity.  Each level is a plain hash aggregate
with map-side partials; bucket keys are integers, AQE handles skewed
buckets like any other group-by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hypertable_rollup"]


def hypertable_rollup(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    granularities: list[int],
) -> DataFrame:
    """Rollup ``value_col`` per key and time bucket at every
    granularity (ts units; must be sorted ascending with each
    granularity a multiple of the previous, so partials nest).

    Output: ``(granularity, bucket, <keys...>, n, sum_value,
    min_value, max_value)`` — one row per (granularity, bucket, keys);
    ``bucket`` is the bucket's start in ts units.
    """
    if not granularities:
        raise ValueError("need at least one granularity")
    for prev, nxt in zip(granularities, granularities[1:]):
        if nxt % prev != 0 or nxt <= prev:
            raise ValueError(
                f"granularities must be ascending and nested; {nxt} is not a "
                f"proper multiple of {prev}"
            )

    g0 = granularities[0]
    level = events.groupBy(
        (F.floor(F.col(ts_col) / g0) * g0).alias("bucket"), *key_cols
    ).agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    out = level.select(F.lit(g0).alias("granularity"), "*")
    for g in granularities[1:]:
        # rollup-of-rollup: aggregate the finer level's partials
        level = level.groupBy(
            (F.floor(F.col("bucket") / g) * g).alias("bucket"), *key_cols
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(level.select(F.lit(g).alias("granularity"), "*"))
    return out
