"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what a cluster deploy would set per-job:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized to the core count rather than the 200 default,
Arrow enabled for the pandas-UDF slow path.

At cluster scale (100 TB / 1000 executors) the same builder is used with
``master`` unset (taken from spark-submit) and ``shuffle_partitions``
raised to ~2-3x total cores; AQE coalesces the excess at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "local_df", "widen_for_kernel"]


def widen_for_kernel(df):
    """Round-robin repartition a frame narrower than the session's
    ``defaultParallelism`` before a CPU-bound ``mapInPandas`` /
    ``applyInPandas`` kernel.

    Python kernels inherit the INPUT's partitioning, and Spark sizes
    scan splits by BYTES — a small table written as 2 part files runs
    the whole kernel in 2 tasks on a 32-core box (r10 scale lesson:
    the sf1 embeddings table produced a NEGATIVE scaling exponent for
    semdedup this way; SCALE.md round-10 section).  The round-robin
    shuffle of the narrow input is trivial next to per-row kernel
    arithmetic; wide inputs (a real lake scan) pass through untouched.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(spark: "SparkSession", rows, schema: str):
    """``spark.createDataFrame`` for small driver-side row lists, via a
    pandas frame.  The plain list path serializes through per-row
    pickling and costs ~5 s per *action* even for 16 rows; the
    pandas/Arrow path is a LocalRelation (~0.1 s).  ``schema`` is a DDL
    string; rows are tuples in schema order.  Empty input falls back to
    the list path (pandas can't carry dtypes for 0 rows).
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    names = [f.split()[0].strip("`") for f in _split_ddl(schema)]
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema)


def _split_ddl(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (array<...> safe)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch in "<("
            depth -= ch in ">)"
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def get_spark(
    app_name: str = "klinker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # RocksDB state store: required by transformWithState, and the
        # at-scale choice anyway (state off-heap + incremental snapshots
        # instead of full in-heap HDFS-backed maps)
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", "false")
        # Driver heap MUST stay under ~32 GiB: above that the JVM
        # disables compressed ordinary object pointers (CompressedOops)
        # and every reference doubles to 8 bytes — measured here as
        # pagerank sf1 going 19 s (16g) → 70-97 s (48g) in otherwise
        # identical fresh sessions.  The earlier bimodal 17.7-47.8 s
        # readings at 16g were machine-contamination (measurements in
        # the page-cache churn window right after another Spark JVM
        # exits — see NOTES.md round-8 forensics), not storage
        # eviction; 16g with the explicit checkpoint lifecycle
        # (ckpt.release) is stable at 8-19 s.  On a real cluster this
        # is executor sizing: prefer more ≤31 GiB executors over fewer
        # giant heaps, for the same CompressedOops reason.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
