"""TF-IDF-filtered token blocking — only tokens whose tf-idf weight
clears a threshold become blocking keys.

Reference: ``/root/reference/src/klinker/blockers/token_blocking.py:
207-384`` (M16): sklearn/dask-ml vectorizers over the concatenated
values; the sparse-matmul "overlap" variant (``:238-241``) is exactly a
token equi-join and is subsumed by ``TokenBlocker``.

Spark-first: no vectorizer matrices at all — tf, df, and idf are three
aggregates over the exploded ``(id, token)`` table, the weight is a
column expression, and the filter happens *before* the block join so
the shuffle only carries surviving tokens.  The token-document-frequency
table is tiny (one row per distinct token) and broadcast-joins.

Formula (fixed engine semantics, sklearn-style smooth idf):
``tf = count(token in entity)``,
``idf = ln((1 + N) / (1 + df)) + 1``,
``weight = tf * idf / l2_norm(entity weights)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..functions.text import tokenize
from .base import SchemaAgnosticBlocker

__all__ = ["TfIdfFilteredTokenBlocker"]


class TfIdfFilteredTokenBlocker(SchemaAgnosticBlocker):
    def __init__(
        self,
        threshold: float = 0.1,
        min_token_length: int = 3,
        purge: bool = False,
        cc_round: int = 2,
    ):
        super().__init__(purge=purge, cc_round=cc_round)
        self.threshold = threshold
        self.min_token_length = min_token_length

    def _weighted_tokens(self, frame: DataFrame, name: str) -> DataFrame:
        """(id, text) → (block_key, id) keeping tokens with normalized
        tf-idf ≥ threshold.  The corpus for df/N is the side itself
        (reference fits one vectorizer per side pair via
        ``_MyVectorizerMixin``, ``token_blocking.py:207-218``)."""
        toks = frame.select(
            "id", F.explode(tokenize("text", self.min_token_length)).alias("token")
        ).where(F.col("token") != "")
        tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
        # N as a 1-row aggregate cross-joined in (broadcast NLJ of a
        # single row) — avoids a driver-side count() job per side.
        n_docs = frame.select(F.countDistinct("id").alias("_n"))
        df = tf.groupBy("token").agg(F.count("*").alias("df"))
        idf = df.crossJoin(F.broadcast(n_docs)).select(
            "token",
            (F.log((1.0 + F.col("_n")) / (1.0 + F.col("df"))) + 1.0).alias("idf"),
        )
        weighted = tf.join(F.broadcast(idf), "token").withColumn(
            "w", F.col("tf") * F.col("idf")
        )
        norm = Window.partitionBy("id")
        return (
            weighted.withColumn("wn", F.col("w") / F.sqrt(F.sum(F.col("w") ** 2).over(norm)))
            .where(F.col("wn") >= self.threshold)
            .select(F.col("token").alias("block_key"), "id")
        )

    def _assign(
        self, left: DataFrame, right: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        return BlockManager.from_key_assignments(
            self._weighted_tokens(left, left_name),
            self._weighted_tokens(right, right_name),
            left_name,
            right_name,
            assume_distinct=True,  # tf groupBy(id, token) dedups upstream
        )
