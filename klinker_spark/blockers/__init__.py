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
