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
    "minhash_signatures",
    "minhash_signature_expr",
    "simhash",
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
    keep_duplicates: bool = False,
) -> Column:
    """Lowercase → split on non-alphanumerics → drop short tokens and
    stopwords.  Returns ``array<string>`` (may be empty, never null for
    non-null input).

    Default stopword removal is ``array_except`` — a SET operation that
    also deduplicates repeated tokens (the blocking-key semantics every
    oracle is written against, where a key is used once per entity).
    ``keep_duplicates=True`` filters stopwords with a per-element
    predicate instead, preserving token OCCURRENCES — required by
    frequency-weighted pooling (mean/SIF word embedding, reference
    ``pretrained.py:339-352`` iterates occurrences, not the set).
    """
    c = F.col(col) if isinstance(col, str) else col
    stopwords = STOPWORDS if stopwords is None else stopwords
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    toks = F.filter(toks, lambda t: F.length(t) >= min_token_length)
    if stopwords:
        sw = F.array(*[F.lit(s) for s in stopwords])
        if keep_duplicates:
            toks = F.filter(toks, lambda t: ~F.array_contains(sw, t))
        else:
            toks = F.array_except(toks, sw)
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

    PERFORMANCE: pass a *materialized column* (a prior ``select``
    alias), never a nested expression like ``word_shingles(tokenize(c))``
    — Column composition copies the inner expression into the per-element
    lambda, so the tokenizer would re-run once per shingle position
    (O(n²) per row; measured 10x on 5k docs).  An aliased column is
    referenced, not copied, and Catalyst keeps the projection separate.
    """
    n = F.size(tokens)
    # zero-token (or NULL) docs yield NO shingles: an '' whole-doc
    # shingle would make every empty doc a "near-duplicate" of every
    # other (and DuckDB's array_to_string([]) is NULL, so oracles
    # can't even express that pairing consistently)
    return (
        F.when(tokens.isNull() | (n == 0), F.array().cast("array<string>"))
        .when(n <= k, F.array(F.array_join(tokens, sep)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), n - F.lit(k)),
                lambda i: F.array_join(F.slice(tokens, i + 1, k), sep),
            )
        )
    )


def minhash_signatures(
    df,
    items_col: Column,
    id_col: str = "id",
    num_perm: int = 64,
    seed: int = 42,
    sig_col: str = "signature",
    hash_fn: str = "xxhash64",
):
    """Per-row MinHash signature over an array column →
    ``(id_col, sig_col array<bigint>)`` DataFrame.

    Permutation i is ``xxhash64(item, seed + i)``; the signature is the
    element-wise min — the standard (a·x+b mod p) family replaced by
    Spark's builtin 64-bit hash (no UDF, unlike the reference's
    datasketch loop ``lsh.py:139-161``).

    Deliberately a DataFrame transform (explode → ``num_perm`` min
    aggregates), NOT a nested higher-order-function expression: Spark's
    project-collapsing re-inlines nested lambda expressions, so a
    sig-as-expression referenced by ``bands`` outer expressions
    re-evaluates the whole shingle pipeline bands×perms times —
    exponential blowup measured at >100x on 500 docs.  The aggregate
    form is linear and map-side-combines.

    Two scale optimizations (no arithmetic, so ANSI-safe):
    - items are deduplicated *within the row* (``array_distinct`` before
      the explode — MinHash is set-semantics and ``min`` ignores
      duplicates anyway, so no cross-row ``distinct()`` shuffle of the
      full item strings is ever needed);
    - the variable-length item string is hashed ONCE; permutation i
      hashes the resulting 8-byte long (``xxhash64(h, seed+i)``), which
      is ~the cost of a multiply, not a string traversal per perm.
    """
    ex = df.select(F.col(id_col), F.explode(F.array_distinct(items_col)).alias("_item"))
    if hash_fn == "md5":
        # Cross-engine-deterministic mode: permutation i is the md5 hex
        # digest of "i:item"; min over the fixed-length lowercase-hex
        # strings is a valid total order.  ~3-5x the hash cost of the
        # xxhash64 path (string digest per perm, no hash-of-hash
        # shortcut) — use it when the signature itself must be
        # reproducible outside Spark (oracles, cross-system handoff).
        aggs = [
            F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("_item")))).alias(f"_h{i}")
            for i in range(num_perm)
        ]
        return (
            ex.groupBy(id_col)
            .agg(*aggs)
            .select(
                id_col,
                F.array(*[F.col(f"_h{i}") for i in range(num_perm)]).alias(sig_col),
            )
        )
    ex = ex.select(F.col(id_col), F.xxhash64(F.col("_item")).alias("_h"))
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(seed + i))).alias(f"_h{i}")
        for i in range(num_perm)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col, F.array(*[F.col(f"_h{i}") for i in range(num_perm)]).alias(sig_col)
        )
    )


def minhash_signature_expr(
    items_col: Column,
    num_perm: int = 64,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> Column:
    """Per-row MinHash signature as a PURE EXPRESSION — an
    ``array`` of the ``num_perm`` per-permutation minima, identical in
    value to :func:`minhash_signatures`' aggregate form over the same
    item set (items are within-row deduplicated the same way).

    Why it exists: the aggregate form is a ``groupBy(id)``, which on a
    stream is unbounded-state aggregation; this form keeps the whole
    signature (and everything built on it — band keys, Bloom probes) a
    stateless projection, so a near-dup gate can run on an unbounded
    stream with no watermark and no state.  Zero-item rows yield NULL
    minima (the aggregate form emits no row at all — callers gate on
    item count).

    Cost note: xxhash64 mode hashes each item string once per call by
    materializing the hashed-items array INSIDE the expression scope
    (a lambda-bound let via ``transform`` over a single-element
    wrapper), then runs the cheap hash-of-hash per permutation — the
    same two-tier scheme as the aggregate form.  Callers should still
    materialize ``items_col`` in its own select first (NOTES lesson 1:
    project-collapsing re-inlines nested lambdas).
    """
    items = F.array_distinct(items_col)
    if hash_fn == "md5":
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        items, lambda it: F.md5(F.concat_ws(":", F.lit(str(i)), it))
                    )
                )
                for i in range(num_perm)
            ]
        )
    if hash_fn != "xxhash64":
        raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")
    # single-element wrapper = poor man's let-binding: the hashed-items
    # array is computed once, every permutation reads the bound lambda
    # variable instead of re-hashing the strings
    hashed = F.transform(items, lambda it: F.xxhash64(it))
    return F.element_at(
        F.transform(
            F.array(hashed),
            lambda hs: F.array(
                *[
                    F.array_min(F.transform(hs, lambda h: F.xxhash64(h, F.lit(seed + i))))
                    for i in range(num_perm)
                ]
            ),
        ),
        1,
    )


def simhash(
    df,
    tokens_col: Column,
    id_col: str = "id",
    bits: int = 64,
    fp_col: str = "fp",
    hash_fn: str = "xxhash64",
):
    """Per-row SimHash fingerprint over a token array →
    ``(id_col, fp_col bigint)`` DataFrame.

    For each bit b: sum over tokens of +1/-1 depending on bit b of
    ``xxhash64(token)``; the fingerprint sets bit b iff the sum > 0.
    Explode → ``bits`` sum aggregates (same rationale as
    ``minhash_signatures``: aggregates stay linear where nested lambda
    expressions re-evaluate); shift amounts are Python ints as the
    DataFrame API requires.

    Scale optimizations:
    - occurrences pre-aggregate to ``(row, token) → count`` and the
      bit-votes are count-weighted — identical result (a sum of ±1 per
      occurrence == ±count) on 10-20x fewer rows;
    - the per-bit one-counts are PACKED three 20-bit lanes per bigint
      (``ceil(bits/3)`` packed sums + one total), so the whole
      fingerprint reduces in ONE hash-aggregate over the (row, token)
      counts.  The previous long format exploded every (row, token)
      row × ``bits`` and paid two extra shuffles; this plan shuffles
      exactly ``ceil(bits/3) + 1`` bigints per row and was measured 3x
      faster at sf1 (fingerprint 13.4 s → ~4 s).  Identical result:
      bit b of the fingerprint is set iff the ±count vote sum is
      positive ⇔ ``2·ones_b > n_total``.
    - lane overflow is impossible below 2²⁰ = 1 048 576 token
      occurrences per row and GUARDED (``raise_error``), never silent;
      rows that long must be chunked first (``chunk_documents``) —
      packing wider lanes for the one outlier would double the
      aggregate width every row pays for.
    """
    if bits > 64:
        # The fingerprint is ONE signed bigint: 64 bits is the hard cap in
        # both hash lanes.  Wider requests used to be "allowed" in the md5
        # lane (the digest has 128 bits) but the weight literals for
        # b >= 64 exceed bigint range and would overflow/NULL silently
        # under non-ANSI configs — reject loudly instead.
        raise ValueError(
            f"simhash: bits={bits} exceeds the 64-bit bigint fingerprint"
        )
    counted = df.select(F.col(id_col), F.explode(tokens_col).alias("_t")).groupBy(
        id_col, "_t"
    ).agg(F.count("*").alias("_n"))
    if hash_fn == "md5":
        # Cross-engine-deterministic mode (see minhash_signatures): bit b
        # of the token hash is bit (b % 4) of hex digit (b div 4) of the
        # md5 digest — any engine with md5 + substr + shifts reproduces
        # the exact fingerprint.
        counted = counted.select(F.col(id_col), F.md5(F.col("_t")).alias("_h"), F.col("_n"))

        def bit_sql(b: int) -> str:
            return (
                f"(shiftright(locate(substr(_h, {b // 4 + 1}, 1),"
                f" '0123456789abcdef') - 1, {b % 4}) & 1)"
            )

    else:
        counted = counted.select(
            F.col(id_col), F.xxhash64(F.col("_t")).alias("_h"), F.col("_n")
        )

        def bit_sql(b: int) -> str:
            return f"(shiftright(_h, {b}) & 1)"

    lane = 20  # bits per packed counter; 3 lanes/bigint keeps the sum
    # far inside signed-64 range: (2^20-1)·(2^40+2^20+1) ≈ 2^60
    n_groups = (bits + 2) // 3
    packed = [
        F.expr(
            "sum("
            + " + ".join(
                f"{bit_sql(3 * g + j)} * _n * {1 << (lane * j)}"
                for j in range(3)
                if 3 * g + j < bits
            )
            + ")"
        ).alias(f"_p{g}")
        for g in range(n_groups)
    ]
    sums = counted.groupBy(id_col).agg(F.sum("_n").alias("_tot"), *packed)
    # bit weights; index 63 (when present) carries the signed-bigint wrap —
    # narrower fingerprints stay non-negative
    weights = [(1 << b) - (1 << 64 if b == 63 else 0) for b in range(bits)]
    ones = [
        f"(shiftright(_p{b // 3}, {lane * (b % 3)}) & {(1 << lane) - 1})"
        for b in range(bits)
    ]
    fp_sql = " + ".join(
        f"CASE WHEN 2 * {ones[b]} > _tot THEN CAST({weights[b]} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    guard = F.when(
        F.col("_tot") >= F.lit(1 << lane),
        F.expr(
            f"raise_error(concat('simhash: row exceeds {(1 << lane) - 1} token"
            f" occurrences (lane overflow) — chunk long rows first: ',"
            f" CAST(`{id_col}` AS STRING)))"
        ).cast("bigint"),
    ).otherwise(F.expr(fp_sql))
    return sums.select(F.col(id_col), guard.alias(fp_col))


def phonetic_key(col: Column | str) -> Column:
    """Soundex-style phonetic key as a pure regex/expression chain.

    American-Soundex variant, defined HERE (not borrowed from any
    engine builtin) so the exact same replace chain runs in Spark and
    in the DuckDB oracle (RE2-safe: character classes only, no
    backreferences; DuckDB side must pass the ``'g'`` flag):

    1. lowercase, strip non-letters; empty → NULL key;
    2. map consonant classes to digits over the WHOLE word
       (b f p v → 1, c g j k q s x z → 2, d t → 3, l → 4, m n → 5,
       r → 6), DELETE h/w, map vowels+y → 0;
    3. collapse runs of each repeated digit (so letters separated by
       h/w merge, and the first letter's code absorbs an adjacent
       same-code letter — "pfister" → p236);
    4. drop the leading digit (it encodes the first letter), delete
       the vowel zeros, keep 3 digits right-padded with 0;
    5. key = first letter + those 3 digits ("robert" → r163).

    Blocking on the key groups spelling variants ("smith"/"smyth",
    "robert"/"rupert") — the classic cheap phonetic blocker for
    entity resolution.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = F.regexp_replace(F.lower(c), "[^a-z]", "")
    code = w
    for pat, repl in [
        ("[bfpv]", "1"), ("[cgjkqszx]", "2"), ("[dt]", "3"), ("l", "4"),
        ("[mn]", "5"), ("r", "6"), ("[hw]", ""), ("[aeiouy]", "0"),
    ]:
        code = F.regexp_replace(code, pat, repl)
    for d in "0123456":
        code = F.regexp_replace(code, f"{d}{d}+", d)
    digits = F.regexp_replace(F.substring(code, 2, 1000), "0", "")
    key = F.concat(F.substring(w, 1, 1), F.rpad(F.substring(digits, 1, 3), 3, "0"))
    return F.when(F.length(w) > 0, key)


def phonetic_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`phonetic_key` — same chain, 'g' flag."""
    code = f"regexp_replace(lower({expr}), '[^a-z]', '', 'g')"
    w = code
    for pat, repl in [
        ("[bfpv]", "1"), ("[cgjkqszx]", "2"), ("[dt]", "3"), ("l", "4"),
        ("[mn]", "5"), ("r", "6"), ("[hw]", ""), ("[aeiouy]", "0"),
    ]:
        code = f"regexp_replace({code}, '{pat}', '{repl}', 'g')"
    for d in "0123456":
        code = f"regexp_replace({code}, '{d}{d}+', '{d}', 'g')"
    digits = f"regexp_replace(substr({code}, 2), '0', '', 'g')"
    return (
        f"CASE WHEN length({w}) > 0 THEN "
        f"substr({w}, 1, 1) || rpad(substr({digits}, 1, 3), 3, '0') END"
    )
