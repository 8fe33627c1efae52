"""Dataset bundle — left/right entity frames + relation frames + gold.

Replaces ``KlinkerDataset`` (``/root/reference/src/klinker/data/
ea_dataset.py:18-166``).  The sylloge loader (``:28-110``, S1) is
replaced by plain parquet readers; ``sample`` (``:112-166``, P9) is
re-expressed with a deterministic hash filter + semi-joins so results
are reproducible across runs and match a SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frames import EntityFrame

__all__ = ["Dataset"]


@dataclass(frozen=True)
class Dataset:
    left: EntityFrame
    right: EntityFrame
    left_rel: DataFrame | None = None
    right_rel: DataFrame | None = None
    gold: DataFrame | None = None  # (left_id, right_id)

    @classmethod
    def read(
        cls,
        spark: SparkSession,
        left_path: str,
        right_path: str,
        left_rel_path: str | None = None,
        right_rel_path: str | None = None,
        gold_path: str | None = None,
        left_name: str = "A",
        right_name: str = "B",
        clean: bool = False,
        fmt: str = "parquet",
    ) -> "Dataset":
        """Load attribute-triple tables per side (+ optional rel/gold)
        from any Spark batch source (``fmt``: parquet / csv / json /
        orc ...; csv reads with header+schema-inference).

        Filters and the RDF-datatype clean (S2) are column expressions,
        so Catalyst pushes the scan down to the needed columns (for
        columnar formats; csv/json always pay a full-row parse —
        convert to parquet before running at scale).
        """

        def rd(path: str) -> DataFrame:
            reader = spark.read.format(fmt)
            if fmt == "csv":
                reader = reader.option("header", "true").option("inferSchema", "true")
            return reader.load(path)

        return cls(
            left=EntityFrame.from_triples(rd(left_path), left_name, clean=clean),
            right=EntityFrame.from_triples(rd(right_path), right_name, clean=clean),
            left_rel=rd(left_rel_path) if left_rel_path else None,
            right_rel=rd(right_rel_path) if right_rel_path else None,
            gold=rd(gold_path) if gold_path else None,
        )

    @classmethod
    def read_parquet(cls, spark: SparkSession, *args, **kwargs) -> "Dataset":
        """Parquet shorthand for :meth:`read` (the original S1 surface)."""
        kwargs.setdefault("fmt", "parquet")
        return cls.read(spark, *args, **kwargs)

    def sample(self, fraction_pct: int, seed: int = 42) -> "Dataset":
        """Deterministic subsample (P9, ``ea_dataset.py:112-166``).

        The reference samples gold pairs then semi-filters both sides'
        attr and rel frames by the sampled ids; the rel filter keeps
        edges touching a sampled id on either end (union of two
        semi-joins).  Sampling here uses ``pmod(hash(id, seed), 100) <
        pct`` instead of ``rand()`` so the same rows are picked every
        run (and by the DuckDB oracle).
        """
        assert self.gold is not None, "sample requires gold links"
        gold = self.gold.where(
            F.pmod(F.hash(F.col("left_id"), F.lit(seed)), F.lit(100)) < fraction_pct
        )
        lids = gold.select(F.col("left_id").alias("id")).distinct()
        rids = gold.select(F.col("right_id").alias("id")).distinct()

        def filter_rel(rel: DataFrame | None, ids: DataFrame) -> DataFrame | None:
            if rel is None:
                return None
            by_head = rel.join(ids.withColumnRenamed("id", "head"), "head", "left_semi")
            by_tail = rel.join(ids.withColumnRenamed("id", "tail"), "tail", "left_semi")
            return by_head.unionByName(by_tail).distinct()

        return Dataset(
            left=self.left.with_attrs(self.left.attrs.join(lids, "id", "left_semi")),
            right=self.right.with_attrs(self.right.attrs.join(rids, "id", "left_semi")),
            left_rel=filter_rel(self.left_rel, lids),
            right_rel=filter_rel(self.right_rel, rids),
            gold=gold,
        )
