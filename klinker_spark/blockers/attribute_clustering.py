"""Attribute-value clustering blocking (M15) — replace each attribute
value by its embedding-cluster label, then block on the labels.

Reference: ``/root/reference/src/klinker/blockers/attribute_clustering.py
:28-151`` (mixin: embed *distinct* values, HDBSCAN them, map value →
``clustering_label_<k>``, merge labels back, run a cheap blocker on the
labels; concrete classes ``:154-393``).

Spark-first differences:
- embedding = the engine's hash-derived token pooling (deterministic,
  JVM-side) instead of gensim vectors — same dataflow, no model file;
- clustering: ``method="kmeans"`` (MLlib, no noise concept),
  ``method="dbscan"`` (``ops.clustering.dbscan_labels`` — distributed
  density clustering with hdbscan's ``-1`` noise convention), or
  ``method="hdbscan"`` (``ops.clustering.hdbscan_labels`` — the REAL
  hierarchy the reference runs: mutual-reachability Borůvka MST +
  condensed-tree selection, min_cluster_size semantics, library label
  conventions).  Any fit runs on the *distinct values* table, orders of magnitude smaller
  than the data — the scalable part, the label join, is a
  broadcastable dimension table exactly like the reference's merge
  (``attribute_clustering.py:62-78``);
- noise handling (``attribute_clustering.py:88-99``,
  ``_handle_noise_cluster``): ``keep`` (noise stays one shared -1
  block), ``remove`` (noise values produce no block), ``token`` (each
  noise value becomes its own block keyed by the value — the
  token-blocking fallback).  Only meaningful with dbscan; kmeans
  labels everything.
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
    def __init__(
        self,
        n_clusters: int = 10,
        dim: int = 32,
        seed: int = 42,
        method: str = "kmeans",
        min_sim: float = 0.9,
        min_pts: int = 3,
        noise_handling: str = "keep",
        min_cluster_size: int = 3,
        allow_single_cluster: bool = True,
        hash_fn: str = "xxhash64",
    ):
        if method not in ("kmeans", "dbscan", "hdbscan"):
            raise ValueError(f"method must be kmeans|dbscan|hdbscan, got {method!r}")
        if noise_handling not in ("keep", "remove", "token"):
            raise ValueError(
                f"noise_handling must be keep|remove|token, got {noise_handling!r}"
            )
        self.n_clusters = n_clusters
        self.dim = dim
        self.seed = seed
        self.method = method
        self.min_sim = min_sim
        self.min_pts = min_pts
        self.noise_handling = noise_handling
        self.min_cluster_size = min_cluster_size
        # attribute tables routinely hold ONE dominant value family;
        # blocking wants that family as a block, not as noise, so the
        # blocker default diverges from the hdbscan-library default
        self.allow_single_cluster = allow_single_cluster
        # "md5" swaps the value embedder into its deterministic
        # SQL-reproducible mode, giving the density path an exact
        # oracle (attribute_clustering_blocking_md5)
        self.hash_fn = hash_fn

    def _embed_values(self, values: DataFrame) -> DataFrame:
        return HashingWordEmbedder(
            dim=self.dim, seed=self.seed, hash_fn=self.hash_fn
        ).encode(
            values.select(F.col("value").alias("id"), F.col("value").alias("text"))
        )

    def _value_labels(self, values: DataFrame) -> DataFrame:
        """Distinct values → ``(value, block_key='clustering_label_<k>')``."""
        emb = self._embed_values(values)
        if self.method in ("dbscan", "hdbscan"):
            if self.method == "hdbscan":
                from ..ops.clustering import hdbscan_labels

                labeled = hdbscan_labels(
                    emb,
                    min_cluster_size=self.min_cluster_size,
                    allow_single_cluster=self.allow_single_cluster,
                ).withColumnRenamed("id", "value")
            else:
                from ..ops.clustering import dbscan_labels

                labeled = dbscan_labels(
                    emb, min_sim=self.min_sim, min_pts=self.min_pts
                ).withColumnRenamed("id", "value")
            if self.noise_handling == "remove":
                labeled = labeled.where(F.col("label") != "-1")
            elif self.noise_handling == "token":
                # noise value becomes its own label (ref :93-98)
                labeled = labeled.withColumn(
                    "label",
                    F.when(F.col("label") == "-1", F.col("value")).otherwise(
                        F.col("label")
                    ),
                )
            return labeled.select(
                "value",
                F.concat(F.lit("clustering_label_"), F.col("label")).alias("block_key"),
            )
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

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
