from .blockbuilder import ClusterBlockBuilder, KNNBlockBuilder, LSHKNNBlockBuilder
from .blocker import EmbeddingBlocker

__all__ = ["ClusterBlockBuilder", "KNNBlockBuilder", "LSHKNNBlockBuilder", "EmbeddingBlocker"]
