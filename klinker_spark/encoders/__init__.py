from .hashing import HashingWordEmbedder, SIFHashingWordEmbedder, initialize_and_fill, remove_first_pc
from .deepblocker import AutoencoderFrameEncoder, CrossTupleTrainingEncoder, HybridDeepBlockerEncoder
from .propagation import GCNFrameEncoder, RelationAwarePropagationEncoder, propagate

__all__ = [
    "HashingWordEmbedder",
    "SIFHashingWordEmbedder",
    "initialize_and_fill",
    "remove_first_pc",
    "AutoencoderFrameEncoder",
    "CrossTupleTrainingEncoder",
    "HybridDeepBlockerEncoder",
    "GCNFrameEncoder",
    "RelationAwarePropagationEncoder",
    "propagate",
]
