"""Data-quality and dataset-versioning primitives.

A 100 TB pipeline ingests from many producers; before blocking or
training-data curation runs, the engine needs cheap whole-table
audits: do foreign keys resolve, what do columns look like, what
changed between two corpus snapshots.  All three operators here are
single-pass / single-join shapes with bounded output (audit rows, not
data rows).

Reference scope anchor: the reference validates inputs only via
pandas dtype checks (``src/klinker/data/enhanced_df.py:206``); these
are beyond-reference operational operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_violations", "column_profile", "snapshot_diff"]


def fk_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """One audit row for a foreign-key relation: total child rows,
    rows with a NULL key, rows whose key has no parent (anti-join),
    and the violation rate in ppm.

    Scale: the anti-join broadcasts the parent's distinct-key
    projection when small, else shuffles on the key — either way one
    join; counts are map-side-combined aggregates.  Fully lazy (no
    driver actions) so relations union into one audit DataFrame.
    """
    base = child.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(child_key).isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_key"),
    )
    orph = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    return base.crossJoin(orph).select(
        F.lit(name).alias("relation"),
        "n_rows",
        F.coalesce("n_null_key", F.lit(0)).alias("n_null_key"),
        "n_orphans",
        F.round(
            1000000.0 * (F.coalesce("n_null_key", F.lit(0)) + F.col("n_orphans"))
            / F.col("n_rows")
        )
        .cast("bigint")
        .alias("violation_ppm"),
    )


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format per-column profile in ONE aggregate pass: row
    count, null count, exact distinct count, min/max (as strings).

    ``count(DISTINCT a), count(DISTINCT b), …`` in a single agg plans
    as Spark's expand-based multi-distinct — one input scan, one
    expanded shuffle; at very wide schemas profile column batches.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"_min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    pieces = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").cast("bigint").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*pieces)).alias("p")).select("p.*")


def snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """Corpus snapshot diff: classify every id as ``added`` /
    ``removed`` / ``modified`` / ``unchanged`` by full outer join on
    the id with a content fingerprint (md5 over the concatenated
    content columns, null-tagged so ``(a, null)`` ≠ ``(anull,)``).

    The versioning primitive for incremental corpora: downstream
    curation re-processes only ``added``+``modified`` partitions.
    One shuffle on the id; fingerprints computed map-side.
    """

    def fp(df: DataFrame) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in content_cols
        ]
        return df.select(
            F.col(id_col).alias("id"), F.md5(F.concat_ws("\x01", *parts)).alias("fp")
        )

    o = fp(old).withColumnRenamed("fp", "fp_old")
    n = fp(new).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, "id", "full_outer")
    return joined.select(
        "id",
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
