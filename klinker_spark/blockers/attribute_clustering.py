"""Attribute-value clustering blocking (M15) — replace each attribute
value by its embedding-cluster label, then block on the labels.

Reference: ``/root/reference/src/klinker/blockers/attribute_clustering.py
:28-151`` (mixin: embed *distinct* values, HDBSCAN them, map value →
``clustering_label_<k>``, merge labels back, run a cheap blocker on the
labels; concrete classes ``:154-393``).

Spark-first differences:
- embedding = the engine's hash-derived token pooling (deterministic,
  JVM-side) instead of gensim vectors — same dataflow, no model file;
- clustering = MLlib ``KMeans`` (no hdbscan in MLlib; the reference
  itself falls back between cuml/sklearn).  KMeans `fit` runs on the
  *distinct values* table which is orders of magnitude smaller than the
  data — the scalable part, the label join, is a broadcastable
  dimension table exactly like the reference's merge
  (``attribute_clustering.py:62-78``);
- noise handling: KMeans has no noise cluster, so ``keep`` semantics
  (every value gets a label) — the reference's default "remove noise"
  applies only to HDBSCAN's -1 labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from ..encoders.hashing import HashingWordEmbedder
from .base import Blocker

__all__ = ["AttributeClusteringBlocker"]


class AttributeClusteringBlocker(Blocker):
    def __init__(self, n_clusters: int = 10, dim: int = 32, seed: int = 42):
        self.n_clusters = n_clusters
        self.dim = dim
        self.seed = seed

    def _value_labels(self, values: DataFrame) -> DataFrame:
        """Distinct values → ``(value, block_key='clustering_label_<k>')``."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        emb = HashingWordEmbedder(dim=self.dim, seed=self.seed).encode(
            values.select(F.col("value").alias("id"), F.col("value").alias("text"))
        )
        feat = emb.select(
            F.col("id").alias("value"), array_to_vector(F.col("vector").cast("array<double>")).alias("features")
        )
        model = KMeans(k=self.n_clusters, seed=self.seed, featuresCol="features").fit(feat)
        return model.transform(feat).select(
            "value",
            F.concat(F.lit("clustering_label_"), F.col("prediction")).alias("block_key"),
        )

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        values = (
            left.attrs.select("value").unionByName(right.attrs.select("value")).distinct()
        )
        labels = self._value_labels(values)
        lk = (
            left.attrs.join(F.broadcast(labels), "value")
            .select("block_key", "id")
            .distinct()
        )
        rk = (
            right.attrs.join(F.broadcast(labels), "value")
            .select("block_key", "id")
            .distinct()
        )
        return BlockManager.from_key_assignments(lk, rk, left.name, right.name, assume_distinct=True)
