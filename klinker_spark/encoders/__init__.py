from .hashing import (
    HashingWordEmbedder,
    SIFHashingWordEmbedder,
    initialize_and_fill,
    reduce_dim,
    remove_first_pc,
)
from .deepblocker import AutoencoderFrameEncoder, CrossTupleTrainingEncoder, HybridDeepBlockerEncoder
from .pretrained import (
    KeyedVectorsEncoder,
    TransformerFrameEncoder,
    load_keyed_vectors,
    load_sentence_encoder,
)
from .propagation import GCNFrameEncoder, RelationAwarePropagationEncoder, propagate

__all__ = [
    "KeyedVectorsEncoder",
    "TransformerFrameEncoder",
    "load_keyed_vectors",
    "load_sentence_encoder",
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
