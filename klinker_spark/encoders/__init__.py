from .hashing import HashingWordEmbedder, SIFHashingWordEmbedder, initialize_and_fill, remove_first_pc
from .propagation import GCNFrameEncoder, RelationAwarePropagationEncoder, propagate

__all__ = [
    "HashingWordEmbedder",
    "SIFHashingWordEmbedder",
    "initialize_and_fill",
    "remove_first_pc",
    "GCNFrameEncoder",
    "RelationAwarePropagationEncoder",
    "propagate",
]
