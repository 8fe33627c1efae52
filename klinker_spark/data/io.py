"""Table loaders for the synthetic star schema (TESTDATA.md).

One quirk: ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects
(`PARQUET_TYPE_ILLEGAL`).  With ``spark.sql.legacy.parquet.nanosAsLong``
(set in ``session.get_spark`` and here defensively) the column arrives
as ``bigint`` nanos; ``load_events`` normalizes it to a proper
microsecond timestamp column so downstream window/watermark code is
storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

__all__ = ["TABLES", "load_table", "load_tables", "load_events"]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        # Integer division: ts ~1.7e18 exceeds double's exact range, so
        # (ts/1000).cast("long") is off by 1µs for ~half the rows.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
