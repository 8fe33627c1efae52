"""Blocker base contracts.

Reference: ``/root/reference/src/klinker/blockers/base.py:9-88`` —
``Blocker.assign(left, right, left_rel?, right_rel?) → blocks`` (E1) and
``SchemaAgnosticBlocker`` which first collapses each entity to one text
blob via ``concat_values`` (E2), then dispatches to ``_assign``.
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame

__all__ = ["Blocker", "SchemaAgnosticBlocker"]


class Blocker(abc.ABC):
    """(left, right[, left_rel, right_rel]) → BlockManager (E1)."""

    @abc.abstractmethod
    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        ...


class SchemaAgnosticBlocker(Blocker):
    """Concat each side's values to ``(id, text)`` then ``_assign`` (E2)."""

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        return self._assign(
            left.concat_values(), right.concat_values(), left.name, right.name
        )

    @abc.abstractmethod
    def _assign(
        self, left: DataFrame, right: DataFrame, left_name: str, right_name: str
    ) -> BlockManager:
        """``left``/``right``: ``(id, text)`` concat frames."""
        ...
