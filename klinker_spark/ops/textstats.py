"""Text analysis operators for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting, token/TF-IDF
statistics (SURVEY §7 milestone 5).

All pure column expressions / aggregates; formulas are fixed engine
semantics so the DuckDB oracle can reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokenize

__all__ = [
    "token_count",
    "quality_score",
    "token_frequencies",
    "tfidf_top_tokens",
    "doc_fingerprint",
    "langid_by_profile",
    "normalize_text",
    "readability_stats",
    "pmi_bigrams",
    "js_divergence_tokens",
    "zipf_fit",
    "distinct_ngram_ratio",
    "skipgram_pairs",
    "target_encode_loo",
    "ngram_lm_score",
]


#: BPE pre-tokenizer segmentation (GPT-2 style, simplified to the
#: lookahead-free subset both Java regex and RE2 support): letter runs,
#: digit runs, and non-alphanumeric-non-space runs each become one
#: pre-token.  Counting these approximates BPE token counts far better
#: than whitespace (punctuation and numbers split off words).
BPE_SPLIT_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def ws_token_count(text_col: str):
    """Whitespace token count expression — THE definition shared by
    ``token_count`` and every aggregate built on it."""
    return F.size(F.split(F.col(text_col), " "))


def bpe_token_count(text_col: str):
    """BPE pre-token count expression (``BPE_SPLIT_RE`` segments)."""
    return F.regexp_count(F.col(text_col), F.lit(BPE_SPLIT_RE))


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counts per document: whitespace tokens, BPE-ish regex
    pre-tokens (``BPE_SPLIT_RE``), and chars.

    Output: ``(doc_id, n_tokens, n_bpe_tokens, n_chars)``.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws_token_count(text_col).alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def readability_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-Kincaid-style readability signals per document — the
    classic curation proxy for "is this text written for humans"
    (reading ease separates prose from boilerplate/logs/code).

    Heuristics (deterministic, engine-portable):
    - words = whitespace tokens (empties dropped);
    - sentences = runs of ``[.!?]`` (min 1 — unpunctuated text is one
      sentence);
    - syllables = per word, vowel-GROUP count ``[aeiouy]+`` of the
      lowercased word, min 1 (the standard cheap approximation).

    Output: ``(doc_id, n_words, n_sentences, n_syllables, fk_grade)``
    with ``fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words)
    − 15.59`` rounded to 6dp.  Zero-word docs are excluded (no grade
    to compute).  Pure per-row expressions — scan-speed at 100 TB.
    """
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(F.lower(w), F.lit(r"[aeiouy]+")), F.lit(1)),
    )
    sent = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("bigint").alias("n_words"),
        sent.cast("bigint").alias("n_sentences"),
        syl.cast("bigint").alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return base.withColumn(
        "fk_grade",
        F.round(
            F.lit(0.39) * (F.col("n_words") / F.col("n_sentences"))
            + F.lit(11.8) * (F.col("n_syllables") / F.col("n_words"))
            - F.lit(15.59),
            6,
        ),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean token length, stopword
    ratio, distinct-token ratio, and a composite score.

    Output: ``(doc_id, n_tokens, mean_token_len, stopword_ratio,
    distinct_ratio, score)``; score = distinct_ratio * (1 - |stopword_ratio - 0.4|)
    scaled by a saturating length factor — a deterministic stand-in for
    the usual fasttext-style quality classifiers.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    mean_len = (F.length(F.col(text_col)) - n + 1) / n  # chars minus separators
    stopword_ratio = n_stop / n
    distinct_ratio = n_distinct / n
    length_factor = F.least(n / F.lit(100.0), F.lit(1.0))
    score = distinct_ratio * (1.0 - F.abs(stopword_ratio - 0.4)) * length_factor
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("score"),
    )


def token_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus token frequency table (A6 shape,
    ``encoders/pretrained.py:470-516``): explode tokens → count.

    Output: ``(token, freq, doc_freq)``.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    return toks.groupBy("token").agg(
        F.count("*").alias("freq"), F.count_distinct("doc_id").alias("doc_freq")
    )


def tfidf_top_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-n characteristic tokens per doc by tf-idf (M16 shape).

    ``idf = ln((1+N)/(1+df)) + 1``; ties broken by token asc.
    Output: ``(doc_id, token, rank)``.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n_docs = docs.select(id_col).distinct().count()
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = df.select("token", (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0).alias("idf"))
    weighted = tf.join(F.broadcast(idf), "token").withColumn("w", F.col("tf") * F.col("idf"))
    w = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), F.col("token").asc())
    return (
        weighted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "token", "rank")
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint robust to token order: md5 of the sorted
    distinct token list.  Output: ``(doc_id, fingerprint)``."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split(F.col(text_col), " "))), " ")
        ).alias("fingerprint"),
    )


def langid_by_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    profile_size: int = 20,
) -> DataFrame:
    """Naive-Bayes-flavored language ID by token voting.

    Train: per language, the ``profile_size`` most frequent tokens
    (ties by token asc) — a tiny broadcastable profile table.
    Predict: each doc token matching a profile token votes for that
    language; argmax votes (ties by lang asc).

    Output: ``(doc_id, pred_lang, votes)``.  On the synthetic corpus
    this exercises the full n-gram-profile language-ID dataflow
    (profile build → broadcast join → per-doc argmax) with
    deterministic results.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).where(F.col("token") != "")
    freq = toks.groupBy("lang", "token").agg(F.count("*").alias("freq"))
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("token").asc())
    profile = freq.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= profile_size
    ).select("lang", "token")

    votes = (
        toks.select("doc_id", "token")
        .join(F.broadcast(profile.withColumnRenamed("lang", "cand_lang")), "token")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("votes"))
    )
    pick = Window.partitionBy("doc_id").orderBy(F.col("votes").desc(), F.col("cand_lang").asc())
    return (
        votes.withColumn("r", F.row_number().over(pick))
        .where(F.col("r") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "votes")
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent word pairs by pointwise mutual information —
    the standard collocation / phrase-mining signal (Church & Hanks
    1990): ``pmi(a,b) = ln( P(ab) / (P(a)·P(b)) )`` with ``P(ab)``
    over adjacent bigram occurrences and ``P(·)`` over unigram
    occurrences.  ``min_count`` floors the bigram count (rare pairs
    have unreliable, inflated PMI).

    Output (rank-ordered, ≤ k rows): ``(rank, a, b, cab, pmi_micro,
    pmi)`` — ``pmi_micro = round(pmi · 1e6)`` (bigint), ties broken by
    ``(a, b)``; ``pmi`` is the 6-dp display value derived from it, so
    the whole row is engine-exact.

    Plan: one scan builds token sequences; bigrams come from an index
    ``transform`` over the array (no self-join on position); unigram
    and bigram ``groupBy`` counts shuffle with map-side partials; the
    two corpus totals ride along as a one-row broadcast.  Top-k is
    ``orderBy().limit(k)`` — TakeOrdered, never a global window.  The
    division chain is a fixed expression tree over exact integer
    counts, so the double (and its micro-rounding) is bit-identical on
    any IEEE engine.
    """
    tk = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # no row filter: an empty token array explodes to zero unigrams and
    # zero bigrams by itself (the slice length is clamped non-negative),
    # and a deterministic size() predicate would be pushed below the
    # projection and re-evaluate the split chain per row (r12 — the
    # filter-over-computed-projection class, measured on the LSH audit)
    seq = docs.select(tk.alias("tk"))
    uni = (
        seq.select(F.explode("tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    bg = (
        seq.select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
                    " (x, i) -> struct(x AS a, tk[i + 1] AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cab"))
    )
    totals = uni.agg(F.sum("c").alias("nu")).crossJoin(
        bg.agg(F.sum("cab").alias("nb"))
    )
    d1 = F.col("cab").cast("double") / F.col("nb").cast("double")
    d2 = F.col("ca").cast("double") / F.col("nu").cast("double")
    d3 = F.col("cb").cast("double") / F.col("nu").cast("double")
    pmi_micro = F.round(F.log(d1 / (d2 * d3)) * 1e6).cast("bigint")
    scored = (
        bg.where(F.col("cab") >= min_count)
        .join(uni.select(F.col("tok").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(totals))
        .select("a", "b", "cab", pmi_micro.alias("pmi_micro"))
        .orderBy(F.col("pmi_micro").desc(), "a", "b")
        .limit(k)
    )
    w = Window.orderBy(F.col("pmi_micro").desc(), "a", "b")
    return scored.select(
        F.row_number().over(w).alias("rank"),
        "a",
        "b",
        "cab",
        "pmi_micro",
        F.round(F.col("pmi_micro") / 1e6, 6).alias("pmi"),
    )


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str | None = "NFC",
    lower: bool = True,
    collapse_ws: bool = True,
    out_col: str = "text_norm",
) -> DataFrame:
    """Unicode text normalization — the canonical first step of a
    multilingual curation pipeline: composed/decomposed codepoint
    variants (``é`` vs ``e``+combining accent) must collapse BEFORE
    any hash-based dedup or tokenization, or visually-identical docs
    hash apart.

    ``form`` (NFC/NFKC/NFD/NFKD) applies Unicode normalization via an
    Arrow-batched ``mapInPandas`` stage — Spark has no builtin, so
    this is a deliberate, documented Python boundary (vectorized
    ``Series.str.normalize``, not per-row UDF); pass ``form=None`` to
    skip it and stay pure-JVM.  Lowercasing and whitespace collapse
    are Catalyst expressions either way.

    Output: input columns + ``out_col``.  Stateless — runs unchanged
    on a stream; at 100 TB it is a map-only pass, zero shuffles.
    """
    if form is not None:
        fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema)
        schema = f"{fields}, `{out_col}` string"

        def norm(batches):
            for pdf in batches:
                out = pdf.copy()
                out[out_col] = pdf[text_col].str.normalize(form)
                yield out

        from ..session import widen_for_kernel

        base = widen_for_kernel(docs).mapInPandas(norm, schema=schema)
        c = F.col(out_col)
    else:
        base = docs
        c = F.col(text_col)
    if lower:
        c = F.lower(c)
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return base.withColumn(out_col, c)


def js_divergence_tokens(
    docs: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
) -> DataFrame:
    """Jensen–Shannon divergence between the whitespace-token unigram
    distributions of two corpus slices (sources, snapshots, languages)
    — the standard symmetric, bounded (≤ ln 2) distribution-shift
    monitor a pipeline runs between training mix and eval set, or
    between crawl snapshots.

    ``JS(P,Q) = ½·KL(P‖M) + ½·KL(Q‖M)`` with ``M = ½(P+Q)``; a token
    absent from one side contributes only through the present side
    (0·ln0 = 0).  Probabilities are exact count ratios; every term
    ``p·ln(p/m)`` is rounded to integer NANO-nats and summed as
    BIGINT, so the result is shuffle-order-free and engine-exact.

    Output (one row): ``(n_tokens_a, n_tokens_b, n_vocab_a, n_vocab_b,
    n_vocab_union, js_nano, js)`` — ``js`` rounded to 6 dp from the
    integer sum.

    Plan: one scan per slice filter (same pass — a conditional
    aggregate over the union), one ``groupBy(token)`` with map-side
    partials, one-row totals broadcast, one final integer sum.
    """
    tk = F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ).alias("tok")
    both = docs.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("g"), tk
    )
    counts = both.groupBy("tok").agg(
        F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)).alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).alias("va"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).alias("vb"),
        F.count("*").alias("vu"),
    )
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    m = (p + q) / 2.0
    term = F.when(F.col("ca") > 0, 0.5 * p * F.log(p / m)).otherwise(0.0) + F.when(
        F.col("cb") > 0, 0.5 * q * F.log(q / m)
    ).otherwise(0.0)
    summed = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "na", "nb", "va", "vb", "vu",
            F.round(term * 1e9).cast("bigint").alias("t_nano"),
        )
        .groupBy("na", "nb", "va", "vb", "vu")
        .agg(F.sum("t_nano").alias("js_nano"))
    )
    return summed.select(
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        F.col("va").alias("n_vocab_a"),
        F.col("vb").alias("n_vocab_b"),
        F.col("vu").alias("n_vocab_union"),
        "js_nano",
        F.round(F.col("js_nano") / 1e9, 6).alias("js"),
    )


def zipf_fit(
    docs: DataFrame,
    top_k: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: least
    squares of ``ln(freq)`` on ``ln(rank)`` for the ``top_k`` most
    frequent tokens.  Natural language sits near slope −1; generated
    or templated text drifts flat (head-heavy) or steep — a cheap
    corpus-level naturalness monitor.

    Engine-exactness: each per-token term (``x = ln rank``,
    ``y = ln freq``, ``xy``, ``x²``) is rounded to integer NANO units,
    the four sums are BIGINT (shuffle-order-free), and the closed-form
    slope/intercept derive from those integers through one fixed
    expression — exact SQL oracle.

    Output (one row): ``(k_used, slope, intercept)`` rounded to 6 dp.

    Plan: one token count aggregate, a TakeOrdered top-k, per-row
    expressions over k rows, a one-row integer sum.
    """
    toks = docs.select(
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    top = counts.orderBy(F.col("freq").desc(), F.col("tok")).limit(top_k)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok"))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    terms = (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.round(x * 1e9).cast("bigint").alias("xn"),
            F.round(y * 1e9).cast("bigint").alias("yn"),
            F.round(x * y * 1e9).cast("bigint").alias("xyn"),
            F.round(x * x * 1e9).cast("bigint").alias("xxn"),
        )
        .agg(
            F.count("*").alias("k_used"),
            F.sum("xn").alias("sx"),
            F.sum("yn").alias("sy"),
            F.sum("xyn").alias("sxy"),
            F.sum("xxn").alias("sxx"),
        )
    )
    k = F.col("k_used").cast("double")
    sx = F.col("sx") / 1e9
    sy = F.col("sy") / 1e9
    sxy = F.col("sxy") / 1e9
    sxx = F.col("sxx") / 1e9
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return terms.select(
        "k_used",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / k, 6).alias("intercept"),
    )


def distinct_ngram_ratio(
    docs: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinct-n diversity (Li et al. 2016) per corpus slice: the
    fraction of n-gram OCCURRENCES that are distinct types —
    the standard degeneration / mode-collapse monitor for generated
    data (low distinct-2 = the corpus repeats itself).

    Output (one row per group): ``(group, n_ngrams, n_distinct,
    distinct_ratio)`` — ratio rounded to 6 dp; groups whose docs have
    fewer than ``n`` tokens contribute no n-grams and drop out.

    Plan: one index-``transform`` n-gram explode (no position
    self-join), one ``(group, ngram)`` count aggregate with map-side
    partials, one per-group rollup.
    """
    tk = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # the clamped slice emits no n-grams for docs shorter than n tokens
    # — the row filter it replaces would re-evaluate the split chain
    # per row once pushed below the projection (r12)
    grams = docs.select(
        F.col(group_col).alias("grp"), tk.alias("tk")
    ).select(
        "grp",
        F.explode(
            F.expr(
                f"transform(slice(tk, 1, greatest(size(tk) - {n - 1}, 0)),"
                f" (x, i) -> array_join(slice(tk, i + 1, {n}), ' '))"
            )
        ).alias("ngram"),
    )
    per = grams.groupBy("grp", "ngram").agg(F.count("*").alias("c"))
    return (
        per.groupBy("grp")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count("*").alias("n_distinct"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_ngrams",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_ngrams"), 6).alias("distinct_ratio"),
        )
    )


def skipgram_pairs(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram (center, context) pair counts — the word2vec training
    pair generator: every ordered pair of tokens at distance ≤
    ``window`` within a document, counted corpus-wide; pairs rarer
    than ``min_count`` are dropped.

    The pair enumeration is ONE array expression per document (nested
    transform over token positions — no positional self-join, no
    UDF); the only shuffle is the (center, context) count aggregate.
    Output rows are bounded by vocab² ∩ observed, not corpus size.
    Per-document cost is O(len·window); a degenerate vocabulary makes
    the AGGREGATE key hot, not the enumeration (same valve as
    pmi_bigrams: min_count floors the tail, the aggregate partials
    absorb the head).
    """
    tk = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    pairs = F.expr(
        f"flatten(transform(tk, (x, i) -> "
        f"transform(filter(sequence(greatest(0, i - {window}), "
        f"least(size(tk) - 1, i + {window})), j -> j != i), "
        f"j -> struct(x AS center, element_at(tk, j + 1) AS context))))"
    )
    # no row filter: an empty token array yields an empty pair array
    # and the explode drops the row by itself; a size() predicate
    # would re-evaluate the split chain per row once pushed below the
    # projection (r12)
    return (
        docs.select(tk.alias("tk"))
        .select(F.explode(pairs).alias("p"))
        .select("p.center", "p.context")
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col_int: str,
    id_cols: list[str],
) -> DataFrame:
    """Leakage-free (leave-one-out) target encoding: each row's
    category feature is the mean target of OTHER rows in its category
    — ``(Σ − x) / (n − 1)`` — so the encoding never sees the row's own
    label (the standard high-cardinality categorical feature for
    tabular models).

    ``target_col_int`` must already be integer-snapped (cents, micro):
    the LOO mean is computed as the integer half-up micro ratio
    ``(2e6·(s − x) + (n−1)) // (2·(n−1))`` in decimal(38) — engine-
    exact, no float accumulation.  Categories of size 1 get NULL (no
    peers to encode from).

    Scale: one tiny category aggregate broadcast back + a codegen
    projection — no second shuffle, no window (same shape as
    :func:`klinker_spark.ops.profile.zscore_outliers`).
    """
    x = F.col(target_col_int).cast("decimal(20,0)")
    stats = df.groupBy(category_col).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("_n"),
        F.sum(x).cast("decimal(38,0)").alias("_s"),
    )
    # `div` (not `/`): decimal `/` re-rounds at the result scale
    # (HALF_UP at scale 6+) BEFORE any floor, which can disagree with
    # an engine's integer division by one ulp-of-scale; decimal `div`
    # truncates the exact quotient.  Both operands are positive and
    # the quotient (a micro mean ≤ ~5e13) fits `div`'s long result.
    num = (F.col("_s") - x) * F.lit(2_000_000).cast("decimal(20,0)") + (
        F.col("_n") - 1
    )
    den = (F.col("_n") - 1) * 2
    return (
        df.join(F.broadcast(stats), category_col)
        .withColumn("_num", num)
        .withColumn("_den", den)
        .select(
            *id_cols,
            F.col(category_col),
            F.when(F.col("_n") > 1, F.expr("_num div _den"))
            .cast("bigint")
            .alias("loo_mean_micro"),
        )
    )


def ngram_lm_score(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style n-gram LM quality scoring (Wenzek et al. 2020):
    score every document by its average bigram negative log-likelihood
    under an add-one-smoothed bigram model trained on a REFERENCE
    corpus — the classic perplexity filter that ranks crawl text by
    closeness to a trusted distribution.

    Model: ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with unigram /
    bigram counts and vocabulary size ``V`` from ``ref``; an unseen
    history backs off to ``1/V``.  Since ``c(w1,w2) ≤ c(w1)`` and
    ``1 ≤ V``, every per-bigram NLL is ≥ 0.

    Integer-exact lane (the pmi_bigrams convention): each bigram's
    ``-ln P`` is computed once from the identical small-int ratio and
    nano-rounded to a bigint FIRST; per-document totals are then pure
    integer sums — shuffle-order-free, so the oracle is exact.  The
    per-doc average is the integer half-up ratio ``(2·Σ + n) div 2n``.

    Scale shape: reference counts are two aggregates; scoring
    pre-aggregates each document's repeated bigrams before the count
    join (join rows ≤ distinct (doc, w1, w2)), joins on the bigram key
    (hash, never all-pairs), and finishes with one per-doc aggregate.
    V rides a one-row broadcast.  Documents with < 2 tokens are
    excluded (no bigram evidence).

    Output: ``(doc_id, n_bigrams, nll_nano_sum, avg_nll_nano)`` —
    lower ``avg_nll_nano`` = closer to the reference distribution.
    """
    tk = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    big = F.expr(
        "transform(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        " (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2))"
    )

    def bigrams(frame: DataFrame, *extra):
        # docs with < 2 tokens emit no bigrams via the clamped slice
        # alone — the row filter this replaces would re-evaluate the
        # split chain per row once pushed below the projection (r12)
        return (
            frame.select(*extra, tk.alias("tk"))
            .select(*extra, F.explode(big).alias("b"))
            .select(*extra, "b.w1", "b.w2")
        )

    cu = (
        ref.select(F.explode(tk).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    cb = bigrams(ref).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    vocab = cu.agg(F.count(F.lit(1)).cast("bigint").alias("v"))

    per_doc = (
        bigrams(docs, F.col(id_col))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("occ"))
        .join(cb, ["w1", "w2"], "left")
        .join(cu, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            "occ",
            F.round(
                F.log(
                    (F.coalesce("cu", F.lit(0)) + F.col("v"))
                    / (F.coalesce("cb", F.lit(0)) + F.lit(1))
                )
                * 1e9
            )
            .cast("bigint")
            .alias("nll_nano"),
        )
    )
    return (
        per_doc.groupBy(id_col)
        .agg(
            F.sum("occ").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("occ") * F.col("nll_nano")).cast("bigint").alias("nll_nano_sum"),
        )
        .select(
            id_col,
            "n_bigrams",
            "nll_nano_sum",
            F.expr("(2 * nll_nano_sum + n_bigrams) div (2 * n_bigrams)").alias(
                "avg_nll_nano"
            ),
        )
    )
