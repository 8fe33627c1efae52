"""Embedding block builders — turn two embedding DataFrames into blocks.

Reference: ``/root/reference/src/klinker/blockers/embedding/
blockbuilder.py`` — kNN builders over kiez/Faiss (J8/M18, ``:51-207``)
and HDBSCAN cluster blocks (M14, ``:286-436``).

Spark-first mapping:
- exact kNN = broadcast cross-join + per-query window top-k
  (``functions.vectors.topk_cosine_join``);
- approximate kNN at scale = MLlib ``BucketedRandomProjectionLSH`` on
  L2-normalized vectors (cosine ≡ euclidean on the unit sphere), an
  ``approxSimilarityJoin`` + window top-k — fully distributed, unlike
  the reference's driver-side Faiss index;
- cluster blocks = MLlib ``KMeans`` (scalable stand-in for HDBSCAN,
  which is driver-side in the reference too; the cluster→blocks step is
  the A1 aggregate either way).

NN output normalized to ``(left_id, neighbors array<string>)``
(``NNBasedKlinkerBlockManager``, ``blocks.py:466-527``) and exposed as a
standard ``BlockManager`` keyed by the left id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..functions.vectors import topk_cosine_join

__all__ = ["KNNBlockBuilder", "LSHKNNBlockBuilder", "ClusterBlockBuilder"]


def _nn_to_blocks(nn: DataFrame, left_name: str, right_name: str) -> BlockManager:
    """``(query_id, neighbor_id, rank)`` → blocks keyed by left id
    (NN-block normalization, ``blocks.py:466-557``): one key frame per
    side, arrays only on demand."""
    lk = nn.select(
        F.col("query_id").alias("block_key"), F.col("query_id").alias("id")
    ).dropDuplicates(["block_key"])
    rk = nn.select(F.col("query_id").alias("block_key"), F.col("neighbor_id").alias("id"))
    return BlockManager.from_key_assignments(
        # every key carries its query id on the left and its neighbors
        # on the right — effective by construction
        lk, rk, left_name, right_name, assume_distinct=True, keys_effective=True
    )


class KNNBlockBuilder:
    """Exact top-k cosine kNN blocks (reference defaults k=5,
    ``blockbuilder.py:139-147``), optionally hubness-reduced
    (``hubness="csls"`` / ``"mutual_rank"`` — the kiez options of
    ``KiezEmbeddingBlockBuilder``, ``blockbuilder.py:107-207``, with
    ``n_candidates`` as the over-retrieval width)."""

    def __init__(self, k: int = 5, hubness: str | None = None, n_candidates: int = 10):
        if hubness not in (None, "csls", "mutual_rank"):
            raise ValueError(f"hubness must be None|csls|mutual_rank, got {hubness!r}")
        self.k = k
        self.hubness = hubness
        self.n_candidates = max(n_candidates, k)

    def build_blocks(
        self, left_emb: DataFrame, right_emb: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        # Persist both sides before the O(|L|·|R|) join: encoder outputs
        # are lazy expression pipelines (hash pooling, AE projections —
        # interpreted higher-order functions), and project-collapsing
        # would inline them into the per-pair similarity, recomputing
        # each vector |other side| times.  Measured 19s → 2s on the
        # sf0.1 deepblocker query.  Tiny tables: (id, vector) rows.
        left_emb = left_emb.persist()
        right_emb = right_emb.persist()
        if self.hubness is None:
            nn = topk_cosine_join(left_emb, right_emb, k=self.k, vec_col="vector")
        else:
            from ..ops.similarity import csls_topk, mutual_rank_topk

            fn = csls_topk if self.hubness == "csls" else mutual_rank_topk
            nn = fn(
                left_emb,
                right_emb,
                k=self.k,
                n_candidates=self.n_candidates,
                id_col="id",
                vec_col="vector",
            )
        return _nn_to_blocks(nn, left_name, right_name)


class LSHKNNBlockBuilder:
    """Approximate kNN via MLlib BucketedRandomProjectionLSH — the
    100 TB path: no broadcast of the index side, similarity join is a
    distributed bucket join.

    ``bucket_length`` ~ typical inter-point distance on the unit sphere;
    ``distance_threshold`` prunes the join before the top-k window (2.0
    = no pruning since unit vectors are at most 2 apart).
    """

    def __init__(
        self,
        k: int = 5,
        num_hash_tables: int = 4,
        bucket_length: float = 0.5,
        distance_threshold: float = 1.2,
        seed: int = 42,
    ):
        self.k = k
        self.num_hash_tables = num_hash_tables
        self.bucket_length = bucket_length
        self.distance_threshold = distance_threshold
        self.seed = seed

    def build_blocks(
        self, left_emb: DataFrame, right_emb: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
        from pyspark.ml.functions import array_to_vector
        from pyspark.sql import Window

        def prep(df: DataFrame) -> DataFrame:
            v = df.select(
                "id", array_to_vector(F.col("vector").cast("array<double>")).alias("raw")
            )
            return Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(v)

        l, r = prep(left_emb), prep(right_emb)
        lsh = BucketedRandomProjectionLSH(
            inputCol="features",
            outputCol="hashes",
            bucketLength=self.bucket_length,
            numHashTables=self.num_hash_tables,
            seed=self.seed,
        ).fit(l)
        joined = lsh.approxSimilarityJoin(l, r, self.distance_threshold, distCol="dist")
        nn = joined.select(
            F.col("datasetA.id").alias("query_id"),
            F.col("datasetB.id").alias("neighbor_id"),
            F.col("dist"),
        )
        w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
        topk = nn.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= self.k)
        return _nn_to_blocks(topk, left_name, right_name)


class ClusterBlockBuilder:
    """Cluster union(left, right) embeddings; one block per cluster per
    side (M14 shape, ``blockbuilder.py:286-436``) — KMeans instead of
    HDBSCAN: distributed fit, no driver collect, no noise label."""

    def __init__(self, n_clusters: int = 10, seed: int = 42, max_iter: int = 20):
        self.n_clusters = n_clusters
        self.seed = seed
        self.max_iter = max_iter

    def build_blocks(
        self, left_emb: DataFrame, right_emb: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        both = left_emb.select(F.lit("L").alias("side"), "id", "vector").unionByName(
            right_emb.select(F.lit("R").alias("side"), "id", "vector")
        )
        feat = both.withColumn(
            "features", array_to_vector(F.col("vector").cast("array<double>"))
        )
        model = KMeans(
            k=self.n_clusters, seed=self.seed, maxIter=self.max_iter, featuresCol="features"
        ).fit(feat)
        labeled = model.transform(feat).select(
            "side", "id", F.col("prediction").cast("string").alias("block_key")
        )
        left_side = labeled.where(F.col("side") == "L").select("block_key", "id")
        right_side = labeled.where(F.col("side") == "R").select("block_key", "id")
        return BlockManager.from_key_assignments(
            left_side, right_side, left_name, right_name
        )
