from .hashing import HashingWordEmbedder, SIFHashingWordEmbedder, initialize_and_fill

__all__ = ["HashingWordEmbedder", "SIFHashingWordEmbedder", "initialize_and_fill"]
