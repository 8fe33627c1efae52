"""Trainable document-quality classifier — the fasttext/CCNet-style
"does this look like the trusted corpus?" model, built on MLlib
(HashingTF bag-of-words → LogisticRegression).

Complements the deterministic quality signals (``textstats.quality_score``
heuristics, ``curation.unigram_logprob_quality`` LM scoring,
``curation.dsir_importance`` importance weights) with the *learned*
variant real pipelines train: positives = a trusted slice (wiki/books),
negatives = the raw crawl; every document is scored with the model's
positive-class probability and filtered/resampled by it.

Scale: HashingTF is a stateless per-row transform (no vocabulary
shuffle — the hashing trick exists precisely for this); LogisticRegression
training is MLlib's distributed L-BFGS (tree-aggregated gradients, a
fixed number of passes over the cached feature frame); scoring is one
map-side model broadcast.  The model itself is O(n_features) — trivially
broadcastable.

Registered rows-only: L-BFGS float reduction order is not bit-stable
across engines, so there is no exact SQL oracle (same class as the
DeepBlocker/KMeans fits); invariants are pinned by unit tests on
separable corpora instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = ["train_quality_scores"]


def train_quality_scores(
    docs: DataFrame,
    positive_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> DataFrame:
    """Train pos-vs-rest on hashed bag-of-words and score every doc.

    ``positive_filter``: boolean Column marking the trusted slice.
    Output: ``(doc_id, label, prob)`` — ``prob`` is the positive-class
    probability, rounded to 6 dp; rank/filter the corpus by it.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        positive_filter.cast("double").alias("label"),
        # NULL text → empty bag, not a NULL array HashingTF chokes on
        F.coalesce(
            tokenize(text_col, 1, [], keep_duplicates=True),
            F.array().cast("array<string>"),
        ).alias("toks"),
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=n_features)
    feat = tf.transform(base).persist()
    lr = LogisticRegression(
        maxIter=max_iter,
        regParam=reg_param,
        featuresCol="features",
        labelCol="label",
    )
    model = lr.fit(feat)
    out = (
        model.transform(feat)
        .select(
            "doc_id",
            F.col("label").cast("int").alias("label"),
            F.round(vector_to_array("probability")[1], 6).alias("prob"),
        )
        .localCheckpoint(eager=True)
    )
    feat.unpersist()
    return out
