from .base import Blocker, SchemaAgnosticBlocker
from .qgrams import QgramsBlocker
from .standard import StandardBlocker
from .token import TokenBlocker
from .unique_name import UniqueNameBlocker

__all__ = [
    "Blocker",
    "SchemaAgnosticBlocker",
    "QgramsBlocker",
    "StandardBlocker",
    "TokenBlocker",
    "UniqueNameBlocker",
]

from .composite import CompositeRelationalTokenBlocker, CompositeUniqueNameBlocker
from .hybrid import (
    CompositeEmbeddingBlocker,
    CompositeLightEABlocker,
    CompositeRelationalDeepBlocker,
)
from .lsh import MinHashLSHBlocker
from .relation_aware import (
    RelationalBlocker,
    RelationalMinHashLSHBlocker,
    RelationalTokenBlocker,
    SimpleRelationalBlocker,
    SimpleRelationalMinHashLSHBlocker,
    SimpleRelationalTokenBlocker,
)
from .tfidf import TfIdfFilteredTokenBlocker

__all__ += [
    "CompositeEmbeddingBlocker",
    "CompositeLightEABlocker",
    "CompositeRelationalDeepBlocker",
    "CompositeRelationalTokenBlocker",
    "CompositeUniqueNameBlocker",
    "MinHashLSHBlocker",
    "RelationalBlocker",
    "RelationalMinHashLSHBlocker",
    "RelationalTokenBlocker",
    "SimpleRelationalBlocker",
    "SimpleRelationalMinHashLSHBlocker",
    "SimpleRelationalTokenBlocker",
    "TfIdfFilteredTokenBlocker",
]
