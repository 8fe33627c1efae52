"""Query registrations: dedup family (split from the original single-file registry; registration order preserved by package import order in __init__)."""
from __future__ import annotations
from ._core import F, _STOP_SQL, _shingle_cte, _t, _toks_cte, doc_fingerprint, exact_dedup, langid_by_profile, minhash_lsh_dedup, ngram_jaccard_dedup, quality_score, register, simhash_dedup, tfidf_top_tokens, token_count, token_frequencies

# ------------------------------------------------------------------ corpus dedup (documents)
@register(
    "exact_dedup",
    """
    SELECT md5(text) AS text_hash, count(*) AS n_docs,
           min(doc_id) AS keep_id
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup_q(spark, sf_dir):
    """Exact dedup: hash-groupBy duplicate groups."""
    return exact_dedup(_t(spark, sf_dir, "documents"))


@register("minhash_dedup")
def minhash_dedup_q(spark, sf_dir):
    """MinHash banded near-dup candidates (xxhash64 signatures — not
    DuckDB-expressible; rows-only check.  Exact-Jaccard oracle coverage
    comes from ngram_jaccard_dedup on the same corpus)."""
    return minhash_lsh_dedup(_t(spark, sf_dir, "documents"), num_perm=32, bands=8)


@register(
    "minhash_dedup_md5",
    "WITH "
    + _shingle_cte()
    + """,
    sig AS (
      SELECT doc_id, p, min(md5(p::varchar || ':' || shingle)) mh
      FROM ds CROSS JOIN (SELECT unnest(generate_series(0, 31)) p)
      GROUP BY doc_id, p),
    bands AS (
      SELECT doc_id, p // 4 band, md5(string_agg(mh, ',' ORDER BY p)) bsig
      FROM sig GROUP BY doc_id, p // 4)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    """,
)
def minhash_dedup_md5_q(spark, sf_dir):
    """MinHash banded near-dup, cross-engine-deterministic mode: md5
    permutations make the signatures (not just the Jaccard estimate)
    reproducible outside Spark — the full signature→band→bucket-join
    pipeline under an exact DuckDB oracle.  Same plan shape as the
    xxhash64 fast path."""
    return minhash_lsh_dedup(
        _t(spark, sf_dir, "documents"), num_perm=32, bands=8, hash_fn="md5"
    )


@register(
    "embedding_signlsh_dedup",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             array_to_string(list_transform(embedding[1:16],
                             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') bits
      FROM embeddings),
    banded AS (
      SELECT vec_id, embedding, c, substr(bits, c * 4 + 1, 4) sig
      FROM b CROSS JOIN (SELECT unnest(generate_series(0, 3)) c)),
    cand AS (
      SELECT DISTINCT a.vec_id doc_a, o.vec_id doc_b,
             a.embedding ea, o.embedding eb
      FROM banded a JOIN banded o
        ON a.c = o.c AND a.sig = o.sig AND a.vec_id < o.vec_id)
    SELECT doc_a, doc_b, sim FROM (
      SELECT doc_a, doc_b,
             round(list_sum(list_transform(list_zip(ea, eb),
                                           p -> p[1]::DOUBLE * p[2]::DOUBLE))
                   / (sqrt(list_sum(list_transform(ea, x -> x::DOUBLE * x::DOUBLE)))
                      * sqrt(list_sum(list_transform(eb, x -> x::DOUBLE * x::DOUBLE)))),
                   6) sim
      FROM cand)
    WHERE sim >= 0.35
    """,
)
def embedding_signlsh_dedup_q(spark, sf_dir):
    """Axis-hyperplane sign-LSH near-dup over embeddings: banded sign
    patterns → equi-join candidates → exact-cosine verify.  Fully
    deterministic (unlike the sampled-hyperplane / KMeans ANN paths),
    so the whole LSH pipeline is exact-oracle-checked."""
    from ..ops.dedup import cosine_signlsh_dedup

    return cosine_signlsh_dedup(
        _t(spark, sf_dir, "embeddings"), threshold=0.35, sign_bits=16, bands=4
    )


@register("simhash_dedup")
def simhash_dedup_q(spark, sf_dir):
    """SimHash near-dup pairs via 16-bit-band pigeonhole (xxhash64 —
    rows-only check)."""
    return simhash_dedup(_t(spark, sf_dir, "documents"), max_hamming=3)


@register(
    "simhash_dedup_md5",
    "WITH "
    + _toks_cte()
    + """,
    cnt AS (SELECT doc_id, token, count(*) n
            FROM (SELECT doc_id, unnest(tk) token FROM toks) GROUP BY 1, 2),
    h AS (SELECT doc_id, md5(token) hx, n FROM cnt),
    votes AS (
      SELECT doc_id, b,
             sum(CASE WHEN ((strpos('0123456789abcdef',
                                    substr(hx, (b // 4) + 1, 1)) - 1
                             >> (b % 4)) & 1) = 1
                      THEN n ELSE -n END) v
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) b)
      GROUP BY 1, 2),
    fp AS (SELECT doc_id,
                  sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) fp
           FROM votes GROUP BY 1),
    chunks AS (SELECT doc_id, fp, c, (fp >> (c * 8)) & 255 sig
               FROM fp CROSS JOIN (SELECT unnest(generate_series(0, 3)) c))
    SELECT DISTINCT a.doc_id AS doc_a, o.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, o.fp)) AS BIGINT) AS hamming
    FROM chunks a JOIN chunks o
      ON a.c = o.c AND a.sig = o.sig AND a.doc_id < o.doc_id
    WHERE bit_count(xor(a.fp, o.fp)) <= 3
    """,
)
def simhash_dedup_md5_q(spark, sf_dir):
    """SimHash near-dup, cross-engine-deterministic mode: 32-bit
    fingerprints from md5 hex digits (bit b = bit b%4 of digit b/4), so
    the vote→fingerprint→chunk-join pipeline carries an exact DuckDB
    oracle.  Same plan shape as the 64-bit xxhash64 fast path."""
    out = simhash_dedup(
        _t(spark, sf_dir, "documents"), max_hamming=3, bits=32, hash_fn="md5"
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


@register(
    "ngram_jaccard_dedup",
    "WITH "
    + _shingle_cte()
    + """,
    sizes AS (SELECT doc_id, count(*) n FROM ds GROUP BY 1),
    inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
              FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def ngram_jaccard_dedup_q(spark, sf_dir):
    """Exact 3-gram-set Jaccard near-dup pairs (threshold 0.5)."""
    out = ngram_jaccard_dedup(_t(spark, sf_dir, "documents"), shingle_k=3, threshold=0.5)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register(
    "ngram_containment_dedup",
    "WITH "
    + _shingle_cte()
    + """,
    sizes AS (SELECT doc_id, count(*) n FROM ds GROUP BY 1),
    inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
              FROM ds a JOIN ds b
                ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
              GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / sa.n, 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    WHERE n_common * 1.0 / sa.n >= 0.6
    """,
)
def ngram_containment_dedup_q(spark, sf_dir):
    """DIRECTIONAL containment pairs (|A∩B|/|A| ≥ 0.6): the
    quoted-inside-longer-doc case symmetric Jaccard misses — one-sided
    prefix filter on the contained side, full inverted list on the
    container side, exact array-intersect verification."""
    from ..ops.dedup import ngram_containment_dedup

    return ngram_containment_dedup(
        _t(spark, sf_dir, "documents"), shingle_k=3, threshold=0.6
    )


@register(
    "tfidf_cosine_join",
    "WITH "
    + _toks_cte()
    + """,
    tok AS (SELECT doc_id, unnest(tk) token FROM toks),
    tf AS (SELECT doc_id, token, count(*) tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, count(*) df FROM tf GROUP BY token),
    nd AS (SELECT count(DISTINCT doc_id) n FROM documents),
    w AS (SELECT doc_id, token,
                 tf * (CAST(CAST(round((ln((1.0 + n) / (1.0 + df)) + 1.0) * 1e9)
                                 AS BIGINT) AS DOUBLE) / 1e9) w
          FROM tf JOIN dfq USING (token) CROSS JOIN nd),
    nr AS (SELECT doc_id,
                  sqrt(CAST(sum(CAST(round(w * w * 1e9) AS BIGINT)) AS BIGINT)
                       / 1e9) nrm
           FROM w GROUP BY doc_id),
    u AS (SELECT w.doc_id, token, w / nrm u FROM w JOIN nr USING (doc_id)),
    pr AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
                  CAST(sum(CAST(round(a.u * b.u * 1e9) AS BIGINT)) AS BIGINT) sn
           FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(round(sn / 1000.0) AS BIGINT) / 1e6 AS cos_sim
    FROM pr WHERE sn / 1e9 >= 0.3
    """,
)
def tfidf_cosine_join_q(spark, sf_dir):
    """Weighted text-similarity join: TF-IDF cosine ≥ 0.3 pairs —
    shared RARE tokens dominate, shared boilerplate barely counts.
    Nano-snapped IDF + order-free integer norms + integer 6-dp display
    keep it engine-exact."""
    from ..ops.dedup import tfidf_cosine_join

    return tfidf_cosine_join(_t(spark, sf_dir, "documents"), threshold=0.3)


@register(
    "tfidf_cosine_join_capped",
    "WITH "
    + _toks_cte()
    + """,
    tok AS (SELECT doc_id, unnest(tk) token FROM toks),
    tf0 AS (SELECT doc_id, token, count(*) tf FROM tok GROUP BY 1, 2),
    dfq AS (SELECT token, count(*) df FROM tf0 GROUP BY token),
    nd AS (SELECT count(DISTINCT doc_id) n FROM documents),
    keep AS (SELECT token, df FROM dfq CROSS JOIN nd WHERE df <= 0.1 * n),
    tf AS (SELECT tf0.* FROM tf0 JOIN keep USING (token)),
    w AS (SELECT doc_id, token,
                 tf * (CAST(CAST(round((ln((1.0 + n) / (1.0 + df)) + 1.0) * 1e9)
                                 AS BIGINT) AS DOUBLE) / 1e9) w
          FROM tf JOIN keep USING (token) CROSS JOIN nd),
    nr AS (SELECT doc_id,
                  sqrt(CAST(sum(CAST(round(w * w * 1e9) AS BIGINT)) AS BIGINT)
                       / 1e9) nrm
           FROM w GROUP BY doc_id),
    u AS (SELECT w.doc_id, token, w / nrm u FROM w JOIN nr USING (doc_id)),
    pr AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
                  CAST(sum(CAST(round(a.u * b.u * 1e9) AS BIGINT)) AS BIGINT) sn
           FROM u a JOIN u b ON a.token = b.token AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(round(sn / 1000.0) AS BIGINT) / 1e6 AS cos_sim
    FROM pr WHERE sn / 1e9 >= 0.3
    """,
)
def tfidf_cosine_join_capped_q(spark, sf_dir):
    """The max_df-capped variant (sklearn's corpus-stopword removal,
    df ≤ 10% of docs): the scale valve that bounds the inverted-join
    fan-out — the synthetic corpus's degenerate shared vocabulary is
    exactly the pathology the cap exists for."""
    from ..ops.dedup import tfidf_cosine_join

    return tfidf_cosine_join(
        _t(spark, sf_dir, "documents"), threshold=0.3, max_df_frac=0.1
    )


@register(
    "embedding_cosine_dedup",
    """
    WITH sims AS (
      SELECT a.vec_id qid, b.vec_id nid,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                                     p -> p[1]::DOUBLE * p[2]::DOUBLE))
             / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
                * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))) sim
      FROM embeddings a CROSS JOIN embeddings b),
    topk AS (
      SELECT qid, nid, round(sim, 6) AS sim FROM (
        SELECT *, row_number() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid ASC) rank
        FROM sims) WHERE rank <= 10)
    SELECT DISTINCT least(qid, nid) AS doc_a, greatest(qid, nid) AS doc_b, sim
    FROM topk WHERE qid <> nid AND sim >= 0.35
    """,
)
def embedding_cosine_dedup_q(spark, sf_dir):
    """Embedding near-dup: SYMMETRIC reflexive top-k cosine ≥ threshold
    with least/greatest canonicalization (a pair counts if either
    endpoint lists it).  Exact oracle: brute-force top-k per row in
    DuckDB, same union-of-directions semantics."""
    from ..ops.dedup import embedding_cosine_dedup

    return embedding_cosine_dedup(_t(spark, sf_dir, "embeddings"), threshold=0.35, k=10)


# ------------------------------------------------------------------ text analysis (documents)
@register(
    "token_count",
    r"""
    SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'))
             AS n_bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def token_count_q(spark, sf_dir):
    return token_count(_t(spark, sf_dir, "documents"))


@register(
    "quality_score",
    """
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') toks FROM documents),
    m AS (SELECT doc_id,
                 len(toks) n,
                 length(text) nc,
                 len(list_filter(toks, x -> list_contains([{stop}], x))) n_stop,
                 len(list_distinct(toks)) n_distinct
          FROM t)
    SELECT doc_id, n AS n_tokens,
           round((nc - n + 1) * 1.0 / n, 6) AS mean_token_len,
           round(n_stop * 1.0 / n, 6) AS stopword_ratio,
           round(n_distinct * 1.0 / n, 6) AS distinct_ratio,
           round((n_distinct * 1.0 / n) * (1.0 - abs(n_stop * 1.0 / n - 0.4))
                 * least(n / 100.0, 1.0), 6) AS score
    FROM m
    """.format(stop=_STOP_SQL),
)
def quality_score_q(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"))


@register(
    "token_frequencies",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) token FROM documents)
    SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
    FROM toks WHERE token != '' GROUP BY token
    """,
)
def token_frequencies_q(spark, sf_dir):
    return token_frequencies(_t(spark, sf_dir, "documents"))


@register(
    "tfidf_top_tokens",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) token FROM documents),
    tf AS (SELECT doc_id, token, count(*) tf FROM toks WHERE token != '' GROUP BY 1, 2),
    n AS (SELECT count(DISTINCT doc_id) nd FROM documents),
    idf AS (SELECT token, ln((1.0 + (SELECT nd FROM n)) / (1.0 + count(*))) + 1.0 idf
            FROM tf GROUP BY token),
    w AS (SELECT doc_id, tf.token, tf * idf w FROM tf JOIN idf ON tf.token = idf.token),
    r AS (SELECT doc_id, token,
                 row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, token ASC) rank
          FROM w)
    SELECT doc_id, token, rank FROM r WHERE rank <= 3
    """,
)
def tfidf_top_tokens_q(spark, sf_dir):
    return tfidf_top_tokens(_t(spark, sf_dir, "documents"), top_n=3)


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark, sf_dir):
    return doc_fingerprint(_t(spark, sf_dir, "documents"))


@register(
    "langid",
    """
    WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) token
                  FROM documents),
    tk AS (SELECT * FROM toks WHERE token != ''),
    freq AS (SELECT lang, token, count(*) freq FROM tk GROUP BY 1, 2),
    prof AS (SELECT lang, token FROM (
        SELECT lang, token,
               row_number() OVER (PARTITION BY lang ORDER BY freq DESC, token ASC) r
        FROM freq) WHERE r <= 20),
    votes AS (SELECT tk.doc_id, prof.lang cand_lang, count(*) votes
              FROM tk JOIN prof ON tk.token = prof.token GROUP BY 1, 2)
    SELECT doc_id, cand_lang AS pred_lang, votes FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY votes DESC, cand_lang ASC) r
      FROM votes) WHERE r = 1
    """,
)
def langid_q(spark, sf_dir):
    """Language ID by token-profile voting (profile build → broadcast
    join → per-doc argmax)."""
    return langid_by_profile(_t(spark, sf_dir, "documents"), profile_size=20)


