"""Unique-name blocking — join entities on attribute values that are
unique *within each side* (high-precision 1:1 blocks).

Reference: ``UniqueNameBlocker``,
``/root/reference/src/klinker/blockers/token_blocking.py:168-204``
(per-side ``nunique == 1`` filter ``:176-184`` = A10, then the value
equi-join J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from .base import Blocker

__all__ = ["UniqueNameBlocker"]


class UniqueNameBlocker(Blocker):
    """Blocks keyed by values held by exactly one entity per side."""

    @staticmethod
    def _unique_values(frame: EntityFrame, name: str) -> DataFrame:
        """A10: ``groupBy(value).agg(countDistinct(id) = 1)``; keeps the
        single owner id per value.  ``max(id)`` is exact under the n=1
        filter — avoids carrying a set."""
        return (
            frame.attrs.where(F.col("value").isNotNull())
            .groupBy(F.col("value").alias("block_key"))
            .agg(
                F.count_distinct(F.col("id")).alias("n"),
                F.max(F.col("id")).alias("only_id"),
            )
            .where(F.col("n") == 1)
            .select("block_key", F.col("only_id").alias("id"))
        )

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        return BlockManager.from_key_assignments(
            self._unique_values(left, left.name),
            self._unique_values(right, right.name),
            left.name,
            right.name,
            assume_distinct=True,
        )
