"""Composite unique-name blocking — a high-precision unique-value pass
first, then attr/rel blockers over only the entities the unique pass
missed.

Reference: ``/root/reference/src/klinker/blockers/composite.py``
(``filter_with_unique`` ``:35-51`` = P10, the flow ``:54-138`` = E5).
The reference's 17-line indicator-merge is Spark's built-in
``left_anti`` join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.blocks import BlockManager
from ..data.frames import EntityFrame
from .base import Blocker, SchemaAgnosticBlocker
from .relation_aware import _ConcatRelationalInfo
from .token import TokenBlocker
from .unique_name import UniqueNameBlocker

__all__ = ["filter_with_unique", "CompositeUniqueNameBlocker", "CompositeRelationalTokenBlocker"]


def filter_with_unique(conc: DataFrame, unique_blocks: BlockManager, side: str) -> DataFrame:
    """Drop entities already covered by unique-name blocks (P10).

    ``conc``: ``(id, ...)`` frame; covered ids come straight from the
    side's assignment table when the manager is key-framed (no array
    cell ever built), else from exploding the block column — either
    way the anti-join Spark has built in (``composite.py:35-51``).
    """
    return conc.join(unique_blocks.covered_ids(side), "id", "left_anti")


class CompositeUniqueNameBlocker(_ConcatRelationalInfo, Blocker):
    """Unique-name pass → anti-join covered entities → attr blocker on
    the rest → rel blocker on neighbor text of the rest → combine (E5).

    The unique blocks table is reused across the attr and rel branches —
    persist() mirrors the reference's ``unique_blocks.blocks.persist()``
    (``composite.py:131``).
    """

    def __init__(
        self,
        attribute_blocker: SchemaAgnosticBlocker,
        relation_blocker: SchemaAgnosticBlocker,
        top_n_a: int | None = None,
        top_n_r: int | None = None,
        use_unique_name: bool = True,
    ):
        super().__init__(top_n_a, top_n_r)
        self._attribute_blocker = attribute_blocker
        self._relation_blocker = relation_blocker
        self.use_unique_name = use_unique_name

    def assign(
        self,
        left: EntityFrame,
        right: EntityFrame,
        left_rel: DataFrame | None = None,
        right_rel: DataFrame | None = None,
    ) -> BlockManager:
        assert left_rel is not None and right_rel is not None
        if not self.use_unique_name:
            attr_blocks = self._attribute_blocker.assign(left, right)
            rel_blocks = self._relation_blocker._assign(
                self._conc(left, left_rel, True),
                self._conc(right, right_rel, True),
                left.name,
                right.name,
            )
            return attr_blocks.combine(rel_blocks)

        # Mark the unique table's KEY FRAMES for caching (rationale in
        # BlockManager.persisted); the array layout is never built —
        # covered-id anti-joins read the assignment tables directly and
        # the combines below stay key-level.  materialize=False: the
        # covered-id anti-joins and the combine legs are all consumed
        # inside combine_all's single stack job, which fills the cache
        # on first touch — an eager fill here would add a serial job
        # barrier for no reuse (A/B at sf0.1: −0.1..−0.8 s per query).
        unique = (
            UniqueNameBlocker()
            .assign(left, right)
            .persisted(effective=True, materialize=False)
        )

        left_rest = left.with_attrs(filter_with_unique(left.attrs, unique, left.name))
        right_rest = right.with_attrs(filter_with_unique(right.attrs, unique, right.name))
        attr_blocks = self._attribute_blocker.assign(left_rest, right_rest)

        left_conc = filter_with_unique(self._conc(left, left_rel, True), unique, left.name)
        right_conc = filter_with_unique(self._conc(right, right_rel, True), unique, right.name)
        rel_blocks = self._relation_blocker._assign(
            left_conc, right_conc, left.name, right.name
        )
        # single stacked-frame combine: each branch spine computes
        # exactly once, one exchange total (see combine_all)
        return BlockManager.combine_all([unique, attr_blocks, rel_blocks])


class CompositeRelationalTokenBlocker(CompositeUniqueNameBlocker):
    """Token/token composite (reference concrete classes
    ``composite.py:141-504`` parameterize the same flow)."""

    def __init__(
        self,
        attr_min_token_length: int = 3,
        rel_min_token_length: int = 3,
        top_n_a: int | None = None,
        top_n_r: int | None = None,
        use_unique_name: bool = True,
    ):
        super().__init__(
            TokenBlocker(min_token_length=attr_min_token_length),
            TokenBlocker(min_token_length=rel_min_token_length),
            top_n_a,
            top_n_r,
            use_unique_name,
        )
