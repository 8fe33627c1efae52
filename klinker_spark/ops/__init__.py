from .dedup import (
    embedding_cosine_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    plan_bands,
    simhash_dedup,
)
from .graph import pagerank
from .layout import compact_small_files, zorder_bin_stats, zorder_key_col
from .profile import (
    global_rank,
    key_skew_stats,
    salted_join,
    sorted_neighborhood_pairs,
)
from .rerank import sinkhorn_rerank
from .similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    brute_force_topk,
    build_ivf_index,
    ivf_index_append,
)
from .sketches import (
    cm_build,
    cm_estimate,
    cm_heavy_hitters,
    cm_join_size,
    hll_distinct,
    hll_distinct_by,
    hll_estimate,
    hll_registers,
    kmv_distinct,
)
from .textstats import (
    doc_fingerprint,
    langid_by_profile,
    quality_score,
    tfidf_top_tokens,
    token_count,
    token_frequencies,
)

__all__ = [
    "plan_bands",
    "pagerank",
    "compact_small_files",
    "zorder_bin_stats",
    "zorder_key_col",
    "global_rank",
    "key_skew_stats",
    "salted_join",
    "sorted_neighborhood_pairs",
    "build_ivf_index",
    "ivf_index_append",
    "cm_build",
    "cm_estimate",
    "cm_heavy_hitters",
    "cm_join_size",
    "hll_distinct",
    "hll_distinct_by",
    "hll_estimate",
    "hll_registers",
    "kmv_distinct",
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
