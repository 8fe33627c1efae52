"""Q-gram blocking — entities sharing a character q-gram of one
attribute's value share a block.

Reference: ``/root/reference/src/klinker/blockers/qgrams.py:16-88``
(q-gram tokenize ``:38-52`` = P6, then the Standard path A1+J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from ..functions.text import qgrams
from .base import Blocker

__all__ = ["QgramsBlocker"]


class QgramsBlocker(Blocker):
    def __init__(self, blocking_key: str, q: int = 3):
        self.blocking_key = blocking_key
        self.q = q

    def _side(self, frame: EntityFrame) -> DataFrame:
        return (
            frame.attrs.where(F.col("prop") == self.blocking_key)
            .select("id", F.explode(qgrams("value", self.q)).alias("block_key"))
            .distinct()
        )

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        return BlockManager.from_key_assignments(
            self._side(left), self._side(right), left.name, right.name,
            assume_distinct=True,  # _side ends in .distinct()
        )
