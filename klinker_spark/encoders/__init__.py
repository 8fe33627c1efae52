from .hashing import (
    HashingWordEmbedder,
    SIFHashingWordEmbedder,
    initialize_and_fill,
    reduce_dim,
    remove_first_pc,
)
from .deepblocker import AutoencoderFrameEncoder, CrossTupleTrainingEncoder, HybridDeepBlockerEncoder
from .pretrained import KeyedVectorsEncoder, load_keyed_vectors
from .propagation import GCNFrameEncoder, RelationAwarePropagationEncoder, propagate

__all__ = [
    "KeyedVectorsEncoder",
    "load_keyed_vectors",
    "HashingWordEmbedder",
    "SIFHashingWordEmbedder",
    "initialize_and_fill",
    "reduce_dim",
    "remove_first_pc",
    "AutoencoderFrameEncoder",
    "CrossTupleTrainingEncoder",
    "HybridDeepBlockerEncoder",
    "GCNFrameEncoder",
    "RelationAwarePropagationEncoder",
    "propagate",
]
