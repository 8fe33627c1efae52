"""Candidate re-ranking — distributed Sinkhorn normalization over the
sparse candidate similarity table (W5/M17).

Reference: ``/root/reference/src/klinker/blockers/embedding/
blockbuilder.py:209-283`` runs dense torch row/col normalization on the
driver over the (n×k) kNN matrix.  The candidate matrix is *sparse* —
k entries per query — so each Sinkhorn iteration is two groupBy-join
normalizations on the ``(query, neighbor, p)`` table; no collect, no
dense matrix, works at any n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sinkhorn_rerank"]


def sinkhorn_rerank(
    cand: DataFrame,
    iters: int = 5,
    temperature: float = 0.05,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    sim_col: str = "sim",
    k: int | None = None,
) -> DataFrame:
    """Sinkhorn-normalize candidate similarities, then re-rank.

    ``exp(sim/temperature)`` seeds the transport matrix; ``iters``
    alternating row/column sum-normalizations push it toward doubly
    stochastic; neighbors are re-sorted by the resulting assignment
    mass (hubness correction: a neighbor popular with *many* queries
    gets its column mass divided away, exactly the effect the
    reference's hubness-reduction seeks).

    Output: ``(query_id, neighbor_id, score, rank)``, rank 1..k.
    """
    t = cand.select(
        F.col(query_col).alias("q"),
        F.col(neighbor_col).alias("n"),
        F.exp(F.col(sim_col) / temperature).alias("p"),
    )
    for _ in range(iters):
        rs = t.groupBy("q").agg(F.sum("p").alias("_rs"))
        t = t.join(rs, "q").select("q", "n", (F.col("p") / F.col("_rs")).alias("p"))
        cs = t.groupBy("n").agg(F.sum("p").alias("_cs"))
        t = t.join(cs, "n").select("q", "n", (F.col("p") / F.col("_cs")).alias("p"))
    w = Window.partitionBy("q").orderBy(F.col("p").desc(), F.col("n").asc())
    out = (
        t.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("q").alias("query_id"),
            F.col("n").alias("neighbor_id"),
            F.col("p").alias("score"),
            "rank",
        )
    )
    return out.where(F.col("rank") <= k) if k else out
