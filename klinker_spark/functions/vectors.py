"""Vector column functions — dot / norm / cosine over ``array<float>``
columns, plus exact top-k cosine joins.

Replaces the reference's ``NamedVector`` bookkeeping
(``/root/reference/src/klinker/data/named_vector.py:29-273``): an
embedding is a row ``(id, vector array)``; row-name invariants become
join keys (SURVEY §1.1).

All expressions are builtin higher-order functions (``zip_with`` /
``aggregate``) — JVM-side, codegen'd, no Python in the hot path.
Math is done in double: deterministic left-to-right summation so
results are reproducible (and match a SQL oracle) bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine", "topk_cosine_join"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def topk_cosine_join(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    query_id: str = "id",
    index_id: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors (J8 baseline / W4).

    Output: ``(query_id, neighbor_id, sim, rank)`` with rank 1..k,
    deterministic tie-break on neighbor id.

    Plan: broadcast the index side (small-dim embedding tables up to a
    few hundred MB broadcast fine), cross-join, per-query window top-k.
    Norms are precomputed per side so the join computes one dot product
    per pair, not three aggregates.  At scale prefer the LSH-bucketed
    path (``ops.similarity.ann_topk_lsh``) or shard the index and union
    per-shard top-k before the final window.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    ix = index.select(
        F.col(index_id).alias("neighbor_id"),
        F.col(vec_col).alias("_iv"),
        l2_norm(F.col(vec_col)).alias("_in"),
    )
    sims = q.join(F.broadcast(ix)).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_iv")) / (F.col("_qn") * F.col("_in"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
