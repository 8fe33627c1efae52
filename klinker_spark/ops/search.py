"""Full-text retrieval operators — BM25 top-k keyword search, a
boolean-coverage ranker, and reciprocal-rank fusion.

The reference library blocks entities by shared tokens; a production
corpus pipeline additionally needs *ranked* keyword retrieval over the
document store (inspecting dedup clusters, pulling eval slices,
debugging contamination hits).  BM25 (Robertson/Spärck Jones; the
Lucene ``k1``/``b`` parameterisation) is the standard scoring function,
and RRF the standard calibration-free way to combine it with a second
ranker (dense kNN in production; the coverage ranker here).

Spark-first design
------------------
Everything is DataFrame algebra — no Python UDFs:

- the query set is a handful of rows → **broadcast** to both the
  postings build and the scoring join; the corpus side never shuffles
  on anything but its own aggregation keys;
- document frequencies are computed **only for the query vocabulary**
  (semi-join before the ``groupBy``), not for the whole corpus — at
  100 TB the df table for a 10-term query set is 10 rows;
- both rankers consume ONE shared postings build
  (:func:`build_postings`): when their outputs are unioned by
  :func:`rrf_fuse` into a single plan, Spark's ReusedExchange
  deduplicates the corpus-side tf/length aggregates instead of
  scanning the corpus once per ranker;
- per-(query, doc) score summation uses **integer micro-nats**
  (``round(score * 1e6)`` summed as BIGINT) so the result is
  independent of shuffle order and bit-identical across engines
  (same recipe as ``unigram_logprob_quality``);
- top-k per query is a rank window over ``(score DESC, doc_id)`` — a
  total order, tie-safe.  One query matching the whole corpus makes
  that query's rank-window partition hot; AQE skew-split covers the
  sort, and the window input is already one row per (query, matched
  doc) — the minimum the semantics allow.

Shuffles: corpus tokenisation aggregates once on ``(doc_id, term)``
(map-side partials), once on ``doc_id`` for lengths, then the scoring
join is broadcast and the final aggregate shuffles on
``(query_id, doc_id)``.  Nothing shuffles the raw token stream twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_postings", "bm25_topk", "coverage_topk", "rrf_fuse"]


def build_postings(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared retrieval state for a query set: ``(qterms, tf, dl)``.

    - ``qterms``: ``(query_id, term)`` — the distinct non-empty
      whitespace tokens of each query text (unit query-term frequency);
    - ``tf``: ``(doc_id, term, tf)`` term occurrences, restricted to
      the query vocabulary BEFORE aggregating (the broadcast semi-join
      prunes the token stream map-side);
    - ``dl``: ``(doc_id, dl)`` token counts over ALL tokens (length
      normalisation is corpus-wide, not query-vocabulary-relative).

    Pass the same triple to every ranker that will be fused into one
    plan — identical subtrees collapse via ReusedExchange.
    """
    spark = docs.sparkSession
    qterms = (
        spark.createDataFrame(queries, "query_id long, query_text string")
        .select("query_id", F.explode(F.split("query_text", " ")).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    # NOT widened (measured, r12): a round-robin repartition of the text
    # projection costs a full-text shuffle round-trip that exceeds what
    # the extra tokenise parallelism saves here — unlike the dedup-family
    # kernels, this chain is one cheap codegen'd split+explode whose
    # output immediately collapses behind the broadcast semi-join.
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).where(F.col("term") != "")
    # Doc length map-side: size(non-empty tokens) per row, summed per
    # doc_id — value-identical to counting the exploded stream (null
    # text sizes to -1 and a zero-token row contributes no group, so
    # docs absent from the exploded form are absent here too), but the
    # corpus is tokenised ONCE for lengths instead of re-exploded:
    # the dl lane's shuffle input drops from |tokens| to |docs| rows.
    row_len = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    )
    dl = (
        docs.select(F.col(id_col).alias("doc_id"), row_len.alias("rl"))
        .where(F.col("rl") > 0)
        .groupBy("doc_id")
        .agg(F.sum("rl").alias("dl"))
    )
    tf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return qterms, tf, dl


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """BM25 top-``k`` documents for each query in ``queries``.

    Output: ``(query_id, rank, doc_id, n_terms_matched, score)`` with
    ``rank`` 1-based per query ordered by ``(score DESC, doc_id)`` and
    ``score`` the micro-nat-summed BM25 value rounded to 6 dp.

    IDF is the Lucene-style non-negative form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.  ``postings`` (from
    :func:`build_postings`) lets fused rankers share the corpus scan.
    """
    qterms, tf, dl = postings or build_postings(docs, queries, id_col, text_col)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl") / n_docs
    idf = F.log(F.lit(1.0) + (n_docs - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))
    score = idf * (F.col("tf") * (k1 + 1.0)) / denom

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id",
            "doc_id",
            F.round(score * 1e6).cast("bigint").alias("s_micro"),
        )
    )

    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.sum("s_micro").alias("score_micro"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "n_terms_matched",
            F.round(F.col("score_micro") / 1e6, 6).alias("score"),
        )
    )


def coverage_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Boolean-coverage ranker: per query, docs ordered by (number of
    distinct query terms present DESC, doc length ASC, doc_id) — the
    calibration-free lexical baseline typically fused with BM25 via
    :func:`rrf_fuse`.  Output: ``(query_id, doc_id, rank)``, rank ≤ k.
    Same shuffle profile as the BM25 postings build."""
    qterms, tf, dl = postings or build_postings(docs, queries, id_col, text_col)
    w = Window.partitionBy("query_id").orderBy(
        F.col("nt").desc(), F.col("dl").asc(), F.col("doc_id")
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("nt"), F.min("dl").alias("dl"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher) of N rankers:
    ``score(d) = Σ_r 1 / (rrf_k + rank_r(d))`` — the standard way to
    combine lexical (BM25) and dense (kNN) retrieval without score
    calibration.

    Each input DataFrame carries ``(query_id, doc_id, rank)``; a doc
    absent from a ranker contributes nothing (the union formulation —
    no outer join needed).  Scores are summed as integer **nano-units**
    (``round(1e9 / (rrf_k + rank))``) so the fused ordering is
    shuffle-order-free and engine-exact.

    Output: ``(query_id, rank, doc_id, n_rankers, score)`` — top ``k``
    per query by ``(score DESC, doc_id)``.

    Scale: a union of already-top-k ranker outputs is tiny relative to
    the corpus — one ``(query_id, doc_id)`` aggregate and a per-query
    rank window over ≤ N·k rows per query.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked DataFrame")
    contrib = F.round(1e9 / (F.lit(rrf_k) + F.col("rank"))).cast("bigint")
    parts = [
        df.select("query_id", "doc_id", contrib.alias("c")) for df in ranked
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_nano").desc(), F.col("doc_id")
    )
    return (
        allp.groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_rankers"), F.sum("c").alias("score_nano"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "n_rankers",
            F.round(F.col("score_nano") / 1e9, 6).alias("score"),
        )
    )
