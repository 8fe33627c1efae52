"""Density-based clustering over an embedding column — the engine's
HDBSCAN stand-in with REAL noise-label semantics (M14/M15).

Reference: ``/root/reference/src/klinker/blockers/attribute_clustering.
py:88-130`` (``_handle_noise_cluster`` — keep / remove / token noise
handling over hdbscan's ``-1`` labels) and
``blockers/embedding/blockbuilder.py:286-436`` (cluster block builder).
The reference runs hdbscan/cuml on the driver; there is no distributed
HDBSCAN, so this module implements **DBSCAN** — the classic density
clustering HDBSCAN generalizes — as pure DataFrame algebra:

1. ε-neighborhood edges: a cosine self-join thresholded at
   ``min_sim`` (unit-sphere euclidean ε ≡ cosine ``1 - ε²/2``);
2. core points: ≥ ``min_pts`` neighbors (self included) — one
   aggregate;
3. clusters: connected components of the core-core subgraph via
   iterated min-label propagation (each round one join + one
   aggregate; rounds bounded by the component diameter — the standard
   GraphX/Pregel shape);
4. border points attach to their smallest-labeled core neighbor;
   everything else is NOISE, label ``-1`` — hdbscan's convention.

Labels are the smallest member id of the component: deterministic,
no fit randomness, any engine reproduces them.

Scale note: the ε-join here is the exact broadcast form (the op is
used on *distinct attribute values*, orders of magnitude smaller than
the data).  For a billion-row ε-join swap the candidate generator for
the banded sign-LSH self-join (``ops.dedup.cosine_signlsh_dedup``
shape) and keep stages 2-4 unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine

__all__ = ["dbscan_labels"]


def dbscan_labels(
    emb: DataFrame,
    min_sim: float = 0.9,
    min_pts: int = 3,
    max_iter: int = 25,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """``(id, vector)`` → ``(id, label)`` with ``label`` the smallest
    id in the point's cluster, or ``"-1"`` for noise."""
    pts = emb.select(
        F.col(id_col).cast("string").alias("id"), F.col(vec_col).alias("v")
    )
    other = pts.select(F.col("id").alias("nid"), F.col("v").alias("nv"))
    # cosine() yields NaN for zero-norm vectors, and Spark orders NaN
    # ABOVE every double — an unguarded `sim >= min_sim` would make a
    # zero vector a neighbor of EVERYTHING (a hub that merges clusters).
    # Zero-norm points have no direction, hence no ε-neighbors: NaN
    # rows are filtered, and such points fall out as noise.
    sim = cosine(F.col("v"), F.col("nv"))
    edges = (
        pts.join(F.broadcast(other), F.col("id") != F.col("nid"))
        .where(~F.isnan(sim) & (sim >= min_sim))
        .select("id", "nid")
    )
    # ε-graph reused by degree count, propagation, and border attach
    edges = edges.persist()

    deg = edges.groupBy("id").agg((F.count("*") + 1).alias("deg"))
    core = (
        pts.select("id")
        .join(deg, "id", "left")
        .where(F.coalesce(F.col("deg"), F.lit(1)) >= min_pts)
        .select("id")
    )
    core = core.persist()
    core_edges = (
        edges.join(core, "id", "left_semi")
        .join(core.withColumnRenamed("id", "nid"), "nid", "left_semi")
        .persist()
    )

    # cluster = connected components of the core-core subgraph; the
    # shared Pregel kernel raises on non-convergence, which would
    # silently split a cluster and diverge from the smallest-member-id
    # semantics (and the recursive-CTE oracle's true fixpoint)
    from .curation import connected_components

    labels = connected_components(
        core_edges, "id", "nid", max_iter=max_iter, vertices=core
    )

    border = (
        edges.join(core.withColumnRenamed("id", "nid"), "nid", "left_semi")
        .join(core, "id", "left_anti")  # not core itself
        .join(labels.withColumnRenamed("id", "nid"), "nid")
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    # materialize before dropping the cached ε-graph — the result is
    # |V| scalar rows, while a lazy return would re-run the ε-join
    out = (
        labels.unionByName(border)
        .unionByName(
            pts.select("id")
            .join(labels.select("id"), "id", "left_anti")
            .join(border.select("id"), "id", "left_anti")
            .select("id", F.lit("-1").alias("label"))
        )
        .localCheckpoint(eager=True)
    )
    for cached in (edges, core, core_edges):
        cached.unpersist()
    return out
