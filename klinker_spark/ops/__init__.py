from .dedup import (
    embedding_cosine_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    simhash_dedup,
)
from .rerank import sinkhorn_rerank
from .similarity import ann_topk_ivf, ann_topk_lsh, brute_force_topk
from .textstats import (
    doc_fingerprint,
    langid_by_profile,
    quality_score,
    tfidf_top_tokens,
    token_count,
    token_frequencies,
)

__all__ = [
    "embedding_cosine_dedup",
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "simhash_dedup",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "brute_force_topk",
    "sinkhorn_rerank",
    "doc_fingerprint",
    "langid_by_profile",
    "quality_score",
    "tfidf_top_tokens",
    "token_count",
    "token_frequencies",
]
