"""Bloom-filter ingestion gate — constant-size membership filtering
against corpus history.

The exact ingestion gate (``streaming/dedup.py::incremental_new_docs``)
anti-joins every incoming batch against the FULL fingerprint history —
at 100 TB that shuffles the history (or at best streams it through a
shuffle-free bucketed join) on every batch.  The Bloom gate replaces
that with a compact bitmap: the history is folded ONCE into ``m_bits``
bits (a few MB for billions of keys at ~10 bits/key), the bitmap
broadcasts to every executor, and each batch probes it map-side —
**zero shuffle, zero history scan per batch**.  False positives (rate
``(1 - e^{-kn/m})^k``) are keys flagged maybe-dup that are actually
new; pipelines either accept the loss or route ONLY the maybe-dup
sliver to the exact anti-join — history-scan cost drops by the filter's
rejection rate either way.  No false negatives: a key the filter
rejects is definitely absent.

Hash functions:

- ``"xxhash64"`` (default): JVM-side, fastest; positions are
  ``pmod(xxhash64(key, seed_i), m_bits)``.
- ``"md5"``: digest-based positions any engine reproduces —
  the cross-engine-deterministic twin (exact DuckDB oracle), same
  plan shape, constant-factor slower.

Bits pack into 32-bit words held in BIGINTs: portable shift range
(DuckDB raises on ``1 << 63``; Spark wraps) and identical two's-
complement-free arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_contains", "bloom_ingest_gate", "bloom_member_expr"]

#: bits per packed word — 32 keeps every shift in the portable range
WORD_BITS = 32

#: above this many words the bitmap ships as an sc.broadcast numpy
#: array probed in mapInPandas instead of a literal Catalyst array
#: (same crossover reasoning as PROBE_LITERAL_MAX_CENTROIDS)
BLOOM_LITERAL_MAX_WORDS = 16384


def _positions(key: Column, n_hashes: int, m_bits: int, hash_fn: str) -> list[Column]:
    """The ``n_hashes`` bit positions of ``key`` — one column each."""
    if hash_fn == "xxhash64":
        return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(n_hashes)]
    if hash_fn == "md5":
        # 15 hex digits < 2^60: conv() never saturates, stays positive
        return [
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 15), 16, 10
            ).cast("long")
            % m_bits
            for i in range(n_hashes)
        ]
    raise ValueError(f"hash_fn must be xxhash64|md5, got {hash_fn!r}")


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Fold ``df[key_col]`` into a Bloom bitmap.

    Output: ``(word_idx int, word long)`` — only the NONZERO 32-bit
    words, at most ``m_bits / 32`` rows regardless of input size.
    NULL keys are ignored (NULL is never a member).

    Plan: explode to ``n_hashes`` scalar (word_idx, bit) rows per key,
    one ``bit_or`` aggregate — map-side partials collapse each
    partition to ≤ ``m_bits/32`` rows before the (tiny) shuffle, so a
    100 TB history reduces in one pass to a bitmap measured in MB.
    """
    key = F.col(key_col)
    pos = df.where(key.isNotNull()).select(
        F.explode(F.array(*_positions(key, n_hashes, m_bits, hash_fn))).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / WORD_BITS).cast("int").alias("word_idx"),
            # SQL form: pyspark's shiftleft() insists on a literal int
            # shift, the SQL function takes a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {WORD_BITS} AS INT))"
            ).alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("word"))
    )


def bloom_dense_words(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect a :func:`bloom_build` result into a dense word list
    (bounded: ≤ ``m_bits/32`` rows by construction)."""
    n_words = (m_bits + WORD_BITS - 1) // WORD_BITS
    dense = [0] * n_words
    for r in bloom.collect():
        dense[r["word_idx"]] = r["word"]
    return dense


def bloom_member_expr(
    key: Column,
    dense: "list[int] | Column",
    m_bits: int,
    n_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> Column:
    """Pure-expression Bloom membership test of ``key`` against a dense
    word list (from :func:`bloom_dense_words`) — composable into any
    projection, including several probes per row (e.g. one per LSH
    band) and stateless streaming plans.  NULL keys are not members.

    ``dense`` may be a Column (an already-bound array) — callers
    probing MANY keys per row against the same filter MUST bind the
    word list once (``F.lit(dense).alias(...)`` in a select) and pass
    the column: a big literal embedded per probe multiplies the plan
    and task-binary size (measured 6.4 MB binaries and minutes of
    analysis at 32 probes x 32k words).
    """
    if isinstance(dense, Column):
        words_arr = dense
    else:
        # ONE Literal node holding the whole array — F.array(*lits)
        # would be a CreateArray with len(dense) children
        words_arr = F.lit([int(w) for w in dense]).cast("array<bigint>")
    checks = None
    for p in _positions(key, n_hashes, m_bits, hash_fn):
        word = F.element_at(words_arr, (p / WORD_BITS).cast("int") + 1)
        c = F.getbit(word, (p % WORD_BITS).cast("int")) == 1
        checks = c if checks is None else (checks & c)
    return F.coalesce(checks, F.lit(False))


def bloom_contains(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    hash_fn: str = "xxhash64",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col``: true iff every hash position of
    ``df[key_col]`` is set in ``bloom`` (maybe-present; false ⇒
    definitely absent).  NULL keys probe as not-member.

    The bitmap is collected (bounded: ≤ ``m_bits/32`` rows by
    construction) and embedded as a dense literal array — membership is
    a pure per-row projection, zero joins, zero shuffles, whole-stage
    codegen.  Above :data:`BLOOM_LITERAL_MAX_WORDS` words the dense
    bitmap ships as one ``sc.broadcast`` numpy array probed in
    ``mapInPandas`` — same semantics, no giant expression tree.
    """
    n_words = (m_bits + WORD_BITS - 1) // WORD_BITS
    dense = bloom_dense_words(bloom, m_bits)

    if n_words <= BLOOM_LITERAL_MAX_WORDS:
        return df.withColumn(
            out_col, bloom_member_expr(F.col(key_col), dense, m_bits, n_hashes, hash_fn)
        )

    # big-bitmap path: broadcast numpy words, probe in Arrow batches
    if hash_fn != "xxhash64":
        raise NotImplementedError(
            "broadcast-bitmap path implements xxhash64 only; md5 mode is "
            f"the oracle twin for m_bits <= {BLOOM_LITERAL_MAX_WORDS * WORD_BITS}"
        )
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.array(dense, dtype=np.int64))
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` boolean"
    # positions computed JVM-side (same expressions as the literal
    # path), only the bit probe crosses into Python
    pos_cols = [
        p.alias(f"_bp{i}")
        for i, p in enumerate(_positions(F.col(key_col), n_hashes, m_bits, hash_fn))
    ]
    with_pos = df.select("*", *pos_cols)

    def probe(batches):
        words = bc.value
        for pdf in batches:
            ok = np.ones(len(pdf), dtype=bool)
            for i in range(n_hashes):
                p = pdf[f"_bp{i}"].to_numpy()
                valid = ~np.isnan(p.astype("float64"))
                pi = np.where(valid, p, 0).astype(np.int64)
                bit = (words[pi // WORD_BITS] >> (pi % WORD_BITS)) & 1
                ok &= valid & (bit == 1)
            out = pdf.drop(columns=[f"_bp{i}" for i in range(n_hashes)])
            out[out_col] = ok
            yield out

    # narrow-ok: memory-bound bit-test over precomputed positions (a
    # few array lookups per row) — an exchange would cost more than
    # the kernel; positions were computed JVM-side upstream
    return with_pos.mapInPandas(probe, schema=schema)


def bloom_ingest_gate(
    incoming: DataFrame,
    history_bloom: DataFrame,
    key_col: str = "fingerprint",
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Ingestion gate: tag each incoming row ``maybe_dup`` (Bloom hit —
    route to the exact check or drop) vs definitely-new (pass straight
    through).  Works identically on a static batch or inside a
    streaming ``foreachBatch``: the bitmap is a plain (small) DataFrame
    the caller refreshes at its own cadence.
    """
    return bloom_contains(
        incoming,
        key_col,
        history_bloom,
        m_bits=m_bits,
        n_hashes=n_hashes,
        hash_fn=hash_fn,
        out_col="maybe_dup",
    )
