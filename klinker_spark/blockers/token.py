"""Token blocking — entities sharing a token land in the same block.

Reference: ``/root/reference/src/klinker/blockers/token_blocking.py:
42-165`` (``_tok_block`` per side ``:105-136``, join ``:162``; the
``/tmp`` parquet spill ``:160-161`` is debug residue, not replicated).

Plan shape per side: concat (one shuffle) → tokenize (codegen regex) →
``explode`` → hash-aggregate ``collect_set`` (second shuffle) → equi-join
on token.  Stop-token hot spots are the classic skew risk (SURVEY §7):
tokens hitting every entity produce quadratic blocks — mitigate with
``max_block_size`` (drops tokens whose per-side id-set exceeds the cap
*before* the join, cutting the shuffle) and/or ``purge()`` after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..functions.text import tokenize
from .base import SchemaAgnosticBlocker

__all__ = ["TokenBlocker"]


class TokenBlocker(SchemaAgnosticBlocker):
    def __init__(
        self,
        min_token_length: int = 3,
        stopwords: list[str] | None = None,
        max_block_size: int | None = None,
    ):
        self.min_token_length = min_token_length
        self.stopwords = stopwords
        self.max_block_size = max_block_size

    def _tok_side(self, frame: DataFrame, name: str) -> DataFrame:
        toks = (
            frame.select(
                "id",
                F.explode(
                    tokenize("text", self.min_token_length, self.stopwords)
                ).alias("block_key"),
            )
            .where(F.col("block_key") != "")
            .groupBy("block_key")
            .agg(F.array_sort(F.collect_set("id")).alias(name))
        )
        if self.max_block_size is not None:
            toks = toks.where(F.size(F.col(name)) <= self.max_block_size)
        return toks

    def _assign(
        self, left: DataFrame, right: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        lb = self._tok_side(left, left_name)
        rb = self._tok_side(right, right_name)
        return BlockManager(lb.join(rb, "block_key", "inner"), left_name, right_name)
