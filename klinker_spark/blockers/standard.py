"""Standard blocking — exact match on one attribute's value.

Reference: ``/root/reference/src/klinker/blockers/standard.py:16-88``
(pandas/dask dual paths ``:36-56`` collapse to one Spark plan).

Plan: per side, project ``(value-as-key, id)`` (column pruning reaches
the scan), one hash-aggregate shuffle for ``collect_set`` (A1), then the
block-key equi-join (J1).  At 100 TB the join key distribution decides
everything: hot values are exactly what ``BlockManager.purge`` removes,
and AQE's skew-join handles the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from .base import Blocker

__all__ = ["StandardBlocker"]


class StandardBlocker(Blocker):
    """Block on equality of a single property's value.

    ``blocking_key`` is the property name in the canonical long form
    (for wide inputs: the original column name).
    """

    def __init__(self, blocking_key: str):
        self.blocking_key = blocking_key

    def _side(self, frame: EntityFrame) -> DataFrame:
        return (
            frame.attrs.where(F.col("prop") == self.blocking_key)
            .where(F.col("value").isNotNull())
            .select(F.col("value").alias("block_key"), "id")
        )

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        return BlockManager.from_key_assignments(
            self._side(left), self._side(right), left.name, right.name
        )
