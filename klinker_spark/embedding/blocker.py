"""Embedding blocker — encode both sides, build NN/cluster blocks, with
a parquet embedding cache.

Reference: ``/root/reference/src/klinker/blockers/embedding/
blocker.py:132-239`` (assign flow + ``save_encoded``/``from_encoded``
cache, S8).  The reference collects embeddings to the driver before NN
search (``encoders/base.py:148-153``); here embeddings stay DataFrames
end-to-end — the collect boundary only exists inside driver-side
trainers, not in the blocking path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from ..encoders.hashing import HashingWordEmbedder
from .blockbuilder import KNNBlockBuilder
from ..blockers.base import Blocker

__all__ = ["EmbeddingBlocker"]


class EmbeddingBlocker(Blocker):
    def __init__(
        self,
        frame_encoder=None,
        block_builder=None,
        save_dir: str | None = None,
        force: bool = False,
    ):
        self.frame_encoder = frame_encoder or HashingWordEmbedder()
        self.block_builder = block_builder or KNNBlockBuilder()
        self.save_dir = save_dir
        self.force = force

    def _encode_side(self, frame: EntityFrame, spark: SparkSession | None) -> DataFrame:
        """Encode with parquet cache (S8 logic: reuse unless ``force``)."""
        if self.save_dir:
            path = os.path.join(self.save_dir, f"{frame.name}_encoded.parquet")
            spark = spark or frame.attrs.sparkSession
            if not self.force and os.path.exists(path):
                return spark.read.parquet(path)
            emb = self.frame_encoder.encode(frame.concat_values())
            emb.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        return self.frame_encoder.encode(frame.concat_values())

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        spark = left.attrs.sparkSession
        left_emb = self._encode_side(left, spark)
        right_emb = self._encode_side(right, spark)
        return self.block_builder.build_blocks(left_emb, right_emb, left.name, right.name)

    def _assign(
        self, left_conc: DataFrame, right_conc: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        """SchemaAgnostic contract on pre-concatenated ``(id, text)``
        frames — lets the embedding blocker slot into composites as the
        relation branch (E6, ``blockers/hybrid.py:15-178``)."""
        left_emb = self.frame_encoder.encode(left_conc)
        right_emb = self.frame_encoder.encode(right_conc)
        return self.block_builder.build_blocks(left_emb, right_emb, left_name, right_name)
