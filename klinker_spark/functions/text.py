"""Text functions — tokenization, q-grams, shingles, hashing.

All pure Catalyst column expressions (no Python UDFs): they run inside
whole-stage codegen and are the hot path of every token-level operator.

Tokenizer semantics (P5): the reference uses
``nltk.word_tokenize`` + lowercase + ``min_token_length=3`` + english
stopword removal (``/root/reference/src/klinker/blockers/
token_blocking.py:21-39``, duplicated ``lsh.py:19-37``).  NLTK is a
row-at-a-time Python call — 10-100x slower than a codegen'd regex split
— so this engine defines the tokenizer as a **regex split on
non-alphanumerics**; the stopword list is a fixed engine constant.  The
min-length and stopword filters match the reference's defaults.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "tokenize",
    "qgrams",
    "word_shingles",
    "minhash_signature",
    "simhash64",
]

# Compact english stopword list (top of NLTK's list); fixed so the
# DuckDB oracle can embed the identical constant.
STOPWORDS = [
    "the", "and", "a", "an", "of", "to", "in", "is", "it", "on",
    "for", "with", "as", "at", "by", "from", "that", "this", "are", "was",
]

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(
    col: Column | str,
    min_token_length: int = 3,
    stopwords: list[str] | None = None,
) -> Column:
    """Lowercase → split on non-alphanumerics → drop short tokens and
    stopwords.  Returns ``array<string>`` (may be empty, never null for
    non-null input).
    """
    c = F.col(col) if isinstance(col, str) else col
    stopwords = STOPWORDS if stopwords is None else stopwords
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    toks = F.filter(toks, lambda t: F.length(t) >= min_token_length)
    if stopwords:
        toks = F.array_except(toks, F.array(*[F.lit(s) for s in stopwords]))
    return toks


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Sliding character n-grams (P6, ``blockers/qgrams.py:38-52``).

    ``transform(sequence(...))`` — pure SQL, no UDF; null in → null out
    like the reference.  Strings shorter than ``q`` yield an empty array
    (guarded: Spark's ``sequence(1, 0)`` would count *down*).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c) - (q - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(c, i, F.lit(q))
    )
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(n < 1, F.array().cast("array<string>")).otherwise(grams)
    )


def word_shingles(tokens: Column, k: int = 3, sep: str = " ") -> Column:
    """k-word shingles over a token array → ``array<string>``.

    Building block for n-gram-Jaccard and MinHash dedup.  Documents
    shorter than k words yield a single shingle of all their tokens.
    """
    n = F.size(tokens)
    return F.when(n <= k, F.array(F.array_join(tokens, sep))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - F.lit(k)),
            lambda i: F.array_join(F.slice(tokens, i + 1, k), sep),
        )
    )


def minhash_signature(shingles: Column, num_perm: int = 32, seed: int = 42) -> Column:
    """MinHash signature as ``array<bigint>`` over a shingle array.

    Permutation i is ``xxhash64(shingle, seed + i)``; the signature is
    the element-wise min — the standard (a*x+b mod p) family replaced by
    Spark's builtin 64-bit hash, all codegen'd (no UDF, unlike the
    reference's datasketch loop ``lsh.py:139-161``).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, i + F.lit(seed)))
        ),
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, as ``bigint``.

    For each bit b: sum over tokens of +1/-1 depending on bit b of
    ``xxhash64(token)``; the fingerprint sets bit b iff the sum > 0.
    Expressed entirely with builtin array/bitwise functions.
    """
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(
            F.aggregate(
                tokens,
                F.lit(0),
                lambda acc, t: acc
                + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, b: F.shiftleft(v.cast("bigint"), b),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc.bitwiseOR(x),
    )
