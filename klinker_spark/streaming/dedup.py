"""Structured Streaming operators — net-new capability beyond the
reference, which is batch-only (SURVEY §2.8): streaming dedup and
windowed aggregation over an event stream.

Each builder takes an *unbounded* DataFrame (``spark.readStream``) and
returns the transformed streaming DataFrame; callers pick the sink.
The same functions accept a batch DataFrame for oracle testing — the
transformations are identical, which is the point of Structured
Streaming's unified model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "streaming_dedup",
    "windowed_event_counts",
    "windowed_ohlc",
    "streaming_token_blocks",
    "incremental_new_docs",
    "neardup_band_keys",
    "incremental_neardup_docs",
]


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events within the watermark horizon.

    State is bounded by the watermark (`dropDuplicatesWithinWatermark`
    — late duplicates beyond it are accepted as new, the standard
    at-scale tradeoff).  On a batch frame falls back to plain
    ``dropDuplicates`` for oracle comparison.
    """
    keys = keys or ["user_id", "event_type", "value"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window per-type counts/sums with late-data watermark.

    Output: ``(window_start, event_type, n_events, sum_value)``.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def windowed_ohlc(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    tie_col: str = "event_id",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window OHLC candles per key — the streaming twin of
    ``ops.temporal.event_value_ohlc``: open/close ride struct-min/max
    on the (ts, tie) total order inside ONE windowed aggregate, so the
    stream pays only watermark-bounded per-window state (no ordering
    state, no per-event log).  Batch frames skip the watermark and
    produce the identical result (parity-tested).

    Output: ``(window_start, user_id, n_events, open_micro,
    high_micro, low_micro, close_micro)``, values micro-snapped.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    base = src.select(
        F.window(F.col(ts_col), window).alias("w"),
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("_t"),
        F.col(tie_col).cast("bigint").alias("_i"),
        F.round(F.col(value_col) * 1e6).cast("bigint").alias("_v"),
    )
    first = F.min(F.struct("_t", "_i", "_v"))["_v"]
    last = F.max(F.struct("_t", "_i", "_v"))["_v"]
    return (
        base.groupBy("w", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            first.alias("open_micro"),
            F.max("_v").alias("high_micro"),
            F.min("_v").alias("low_micro"),
            last.alias("close_micro"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "open_micro",
            "high_micro",
            "low_micro",
            "close_micro",
        )
    )


def streaming_token_blocks(
    events: DataFrame,
    ts_col: str = "ts",
    text_col: str = "props",
    id_col: str = "event_id",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window token blocking over a text column: within each
    window, events sharing a token form a block (the TokenBlocker A1
    aggregate under a stream window).

    Output: ``(window_start, token, ids array)``.
    """
    from ..functions.text import tokenize

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    toks = src.select(
        F.col(ts_col), F.col(id_col).alias("id"), F.explode(tokenize(text_col, 1)).alias("token")
    )
    return (
        toks.groupBy(F.window(F.col(ts_col), window).alias("w"), "token")
        .agg(F.collect_set("id").alias("ids"))
        .select(F.col("w.start").alias("window_start"), "token", "ids")
    )


def incremental_new_docs(
    docs: DataFrame,
    history_fingerprints: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Incremental corpus ingestion: from a document stream, pass only
    docs whose content fingerprint is NOT in the static history table —
    the "don't re-ingest what the corpus already has" gate every
    continuously-updated training corpus runs.

    ``history_fingerprints``: a static (batch) DataFrame with column
    ``fp_col`` — typically the md5 fingerprints of the existing corpus
    read from its metadata parquet.  Streaming-static left-anti joins
    are stateless (no watermark needed; the static side broadcasts or
    hash-joins per micro-batch), so state does NOT grow with the
    stream.  Within-stream duplicates pass through here — chain
    ``streaming_dedup``-style ``dropDuplicates`` on the fingerprint
    with a watermark when the stream itself repeats content.

    Output: the input docs plus a ``fingerprint`` column, filtered to
    unseen content.  Works identically on a batch frame (same plan,
    bounded input) for oracle testing.
    """
    fp = docs.withColumn(fp_col, F.md5(F.col(text_col)))
    hist = history_fingerprints.select(F.col(fp_col))
    return fp.join(hist, fp_col, "left_anti")


def _band_key_exprs(sig_col, num_perm: int, bands: int, hash_fn: str):
    """Band-key expressions over a signature array column — same
    construction as ``ops/dedup.py::minhash_lsh_dedup`` (``b_`` prefix +
    hash of the comma-joined band slice) so history indexes and gates
    built by either path are interchangeable."""
    from pyspark.sql import functions as F

    rows = num_perm // bands
    band_hash = F.md5 if hash_fn == "md5" else F.xxhash64
    return [
        F.concat_ws(
            "_",
            F.lit(b),
            band_hash(F.concat_ws(",", F.slice(sig_col, b * rows + 1, rows))),
        )
        for b in range(bands)
    ]


def neardup_band_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash LSH band keys per document: ``(doc_id, band_key)`` —
    the corpus-history index an incremental near-dup gate probes
    against (store it with the corpus metadata; fold into a Bloom
    bitmap for the stateless gate).  Zero-shingle docs emit no keys.

    Stateless per-row expressions end-to-end (the signature is
    :func:`~klinker_spark.functions.text.minhash_signature_expr`, not
    a groupBy) — runs identically on a stream.
    """
    from pyspark.sql import functions as F

    from ..functions.text import minhash_signature_expr, tokenize, word_shingles

    # zero-shingle guard on the RAW text column: tokenize splits
    # lowercased text on [^a-z0-9]+ with min length 1, so the token
    # (hence shingle) array is non-empty iff the lowercased text
    # contains an alphanumeric — one regex probe per row that pushes
    # to the source.  A size() predicate over the shingle array would
    # be pushed below the projections and re-evaluate the whole
    # tokenize+shingle chain per row (r12 — the filter-over-computed-
    # projection class); NULL text drops on either form.
    #
    # each stage materialized in its own select: project-collapsing
    # would otherwise re-inline the tokenizer into every lambda
    sh = (
        docs.where(F.lower(F.col(text_col)).rlike("[a-z0-9]"))
        .select(F.col(id_col).alias("doc_id"), tokenize(text_col, 1, []).alias("tk"))
        .select("doc_id", word_shingles(F.col("tk"), shingle_k).alias("sh"))
    )
    sig = sh.select(
        "doc_id",
        minhash_signature_expr(F.col("sh"), num_perm, seed, hash_fn).alias("sig"),
    )
    return sig.select(
        "doc_id",
        F.explode(F.array(*_band_key_exprs(F.col("sig"), num_perm, bands, hash_fn))).alias(
            "band_key"
        ),
    )


def incremental_neardup_docs(
    docs: DataFrame,
    history_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    m_bits: int = 1 << 20,
    n_bloom_hashes: int = 4,
) -> DataFrame:
    """NEAR-dup-aware ingestion gate, stateless on an unbounded stream.

    :func:`incremental_new_docs` gates exact content; this gates
    near-duplicates: a doc is flagged when ANY of its MinHash LSH bands
    collides with the corpus history.  ``history_bands`` is the
    ``(band_key)`` frame from :func:`neardup_band_keys` over the
    existing corpus — folded ONCE here into a Bloom bitmap
    (``ops/bloom.py``), after which the per-batch plan is pure per-row
    expressions: shingle → signature (expression form, no groupBy) →
    band keys → ``bands`` Bloom probes OR-ed.  No join, no aggregation,
    no watermark; state is ``m_bits`` regardless of history size — vs
    the exact gate's per-batch anti-join against the full fingerprint
    table.  Bloom false positives flag a genuinely-new doc maybe-dup
    (route that sliver to the exact pair check); band semantics are the
    usual LSH trade (collision ⇒ likely-similar, tuned by
    num_perm/bands).

    Output: docs + ``(n_shingles, maybe_neardup)``; zero-shingle docs
    are never flagged.
    """
    from pyspark.sql import functions as F

    from ..functions.text import minhash_signature_expr, tokenize, word_shingles
    from ..ops.bloom import bloom_build, bloom_dense_words, bloom_member_expr

    bloom = bloom_build(
        history_bands, "band_key", m_bits=m_bits, n_hashes=n_bloom_hashes, hash_fn=hash_fn
    )
    dense = bloom_dense_words(bloom, m_bits)

    sh = docs.select(
        "*", tokenize(text_col, 1, []).alias("_tk")
    ).select("*", word_shingles(F.col("_tk"), shingle_k).alias("_sh")).drop("_tk")
    sig = sh.select(
        "*",
        F.when(
            F.size("_sh") > 0,
            minhash_signature_expr(F.col("_sh"), num_perm, seed, hash_fn),
        ).alias("_sig"),
    )
    # band keys in their own select so each is computed once, not once
    # per Bloom position hash.  The word array arrives as DATA — a
    # one-row broadcast cross join — NOT a literal: CollapseProject
    # inlines literal aliases (literals are "cheap"), so a bound
    # literal array still gets copied into every probe expression
    # (measured: bands x positions copies = 6.4 MB task binaries and
    # minutes of plan analysis at 32k words); a relation column can't
    # be inlined, and stream-static broadcast joins are stateless
    from ..session import local_df

    words_row = local_df(
        docs.sparkSession, [([int(w) for w in dense],)], "_bw array<bigint>"
    )
    keyed = sig.join(F.broadcast(words_row)).select(
        "*",
        *[
            bk.alias(f"_bk{b}")
            for b, bk in enumerate(_band_key_exprs(F.col("_sig"), num_perm, bands, hash_fn))
        ],
    )
    hit = None
    for b in range(bands):
        c = bloom_member_expr(
            F.col(f"_bk{b}"), F.col("_bw"), m_bits, n_bloom_hashes, hash_fn
        )
        hit = c if hit is None else (hit | c)
    return keyed.select(
        "*",
        F.size("_sh").alias("n_shingles"),
        (F.col("_sig").isNotNull() & hit).alias("maybe_neardup"),
    ).drop("_sh", "_sig", "_bw", *[f"_bk{b}" for b in range(bands)])
