"""Graph-propagation frame encoders — message passing over the KG edge
list expressed as iterated join-aggregate, no torch.

Reference parity:
- ``GCNFrameEncoder`` ↔ ``/root/reference/src/klinker/encoders/gcn.py:
  108-234`` (M9): *untrained* (frozen random-weight) GCN over the merged
  relation graph, ``depth`` hops, gcn-norm with self-loops.  The
  reference runs torch sparse matmuls on a single node; sparse matmul
  IS a join + sum aggregate, so the Spark form distributes the same
  math with no collect.
- ``RelationAwarePropagationEncoder`` ↔ the LightEA-style relation-
  conditioned propagation (``encoders/light_ea.py:55-294``, M12),
  simplified: instead of the three-view label-propagation tensors,
  messages are modulated component-wise by a hash-derived unit vector
  per relation name — relation semantics influence the embedding
  without any trained parameters, matching the reference's
  training-free design point.

Scale design (the reason for the *long* layout): features are held as
``(id, dim, val)`` rows, NOT ``array<float>`` cells, during
propagation.  Each hop is then

    edges ⨝ feat ON tail=id  →  groupBy (head, dim) sum(val·w)

— a plain codegen'd HashAggregate with map-side partial aggregation.
A hub node's messages spread over ``dim`` aggregation keys instead of
forming one giant ``collect_list`` cell, and AQE's skew handling sees
ordinary shuffle keys.  Arrays are materialized once, at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data.frames import reverse_rel
from .hashing import HashingWordEmbedder, initialize_and_fill

__all__ = ["propagate", "GCNFrameEncoder", "RelationAwarePropagationEncoder"]


def _to_long(features: DataFrame) -> DataFrame:
    return features.select("id", F.posexplode("vector").alias("dim", "val"))


def _to_array(long: DataFrame) -> DataFrame:
    """(id, dim, val) → (id, vector) with dims in order."""
    return long.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "val"))), lambda s: s["val"]
        ).alias("vector")
    )


def propagate(
    features: DataFrame,
    edges: DataFrame,
    depth: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """``depth`` hops of weighted message passing.

    ``features``: ``(id, vector array)``; ``edges``: ``(head, tail, w)``
    *directed, weights prepared by the caller* (self-loops included if
    wanted).  Messages flow tail → head.  With ``normalize`` each hop
    L2-normalizes per node (LightEA's per-round norm,
    ``light_ea.py:176-248``).
    """
    # The edge list (plus its degree-normalization joins) appears once
    # per hop in the lazy plan — persist so the union/distinct/degree
    # pipeline runs once, not ``depth`` times.  Standard iterative-graph
    # practice (GraphX does the same); memory is O(|edges|) rows of
    # (head, tail, w).
    if depth > 1:
        edges = edges.persist()
    long = _to_long(features)
    for _ in range(depth):
        long = (
            edges.join(long.withColumnRenamed("id", "tail"), "tail")
            .groupBy(F.col("head").alias("id"), F.col("dim"))
            .agg(F.sum(F.col("val") * F.col("w")).alias("val"))
        )
        if normalize:
            norm = long.groupBy("id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("_n"))
            long = long.join(norm, "id").select(
                "id", "dim", (F.col("val") / F.when(F.col("_n") > 0, F.col("_n")).otherwise(1.0)).alias("val")
            )
    return _to_array(long)


def _gcn_edges(rels: DataFrame, rel_weight=None) -> DataFrame:
    """Undirected + self-loop edge list with symmetric GCN normalization
    ``w = 1/sqrt(deg(head)·deg(tail))`` (degrees include the self-loop),
    the norm the reference ports from pyg (``gcn.py:30-105``)."""
    und = rels.select("head", "rel", "tail").unionByName(
        reverse_rel(rels).select("head", "rel", "tail")
    )
    ids = und.select(F.col("head").alias("id")).union(und.select("tail")).distinct()
    loops = ids.select(
        F.col("id").alias("head"), F.lit("_self_").alias("rel"), F.col("id").alias("tail")
    )
    all_e = und.unionByName(loops)
    deg = all_e.groupBy("head").agg(F.count("*").alias("deg"))
    e = (
        all_e.join(deg, "head")
        .join(
            deg.select(F.col("head").alias("tail"), F.col("deg").alias("deg_t")), "tail"
        )
        .select(
            "head",
            "rel",
            "tail",
            (F.lit(1.0) / F.sqrt(F.col("deg") * F.col("deg_t"))).alias("w"),
        )
    )
    return e


class GCNFrameEncoder:
    """Untrained GCN-style relational encoder (M9/M10/M11).

    ``encode(conc, rels)``: attribute text → base vectors
    (``attr_encoder``, default :class:`HashingWordEmbedder`); every
    graph node missing from the attribute frame gets a deterministic
    hash-init vector (``initialize_and_fill``, M10); then ``depth``
    gcn-normalized hops.
    """

    def __init__(
        self,
        depth: int = 2,
        dim: int = 32,
        seed: int = 42,
        attr_encoder=None,
        hash_fn: str = "xxhash64",
    ):
        self.depth = depth
        self.dim = dim
        self.seed = seed
        self.hash_fn = hash_fn  # governs the M10 init; "md5" = cross-engine mode
        self.attr_encoder = attr_encoder or HashingWordEmbedder(
            dim=dim, seed=seed, hash_fn=hash_fn
        )

    def _edges(self, rels: DataFrame) -> DataFrame:
        return _gcn_edges(rels).select("head", "tail", "w")

    def encode(self, conc: DataFrame, rels: DataFrame) -> DataFrame:
        attr_vec = self.attr_encoder.encode(conc)
        ids = (
            conc.select("id")
            .union(rels.select(F.col("head").alias("id")))
            .union(rels.select(F.col("tail").alias("id")))
            .distinct()
        )
        feat0 = initialize_and_fill(ids, attr_vec, self.dim, self.seed, self.hash_fn)
        return propagate(feat0, self._edges(rels), depth=self.depth, normalize=False)


class RelationAwarePropagationEncoder(GCNFrameEncoder):
    """LightEA-flavored propagation (M12, simplified): each message is
    modulated by a per-relation hash vector before aggregation, and
    every hop L2-normalizes.  The relation table is tiny (distinct
    relation names) and folds into the edge list as a scalar weight per
    (edge, dim) — implemented by scaling inside the long-format join.
    """

    def encode(self, conc: DataFrame, rels: DataFrame) -> DataFrame:
        from .hashing import token_vector_expr

        attr_vec = self.attr_encoder.encode(conc)
        ids = (
            conc.select("id")
            .union(rels.select(F.col("head").alias("id")))
            .union(rels.select(F.col("tail").alias("id")))
            .distinct()
        )
        feat0 = initialize_and_fill(ids, attr_vec, self.dim, self.seed, self.hash_fn)

        edges = _gcn_edges(rels)  # (head, rel, tail, w)
        if self.depth > 1:
            edges = edges.persist()  # reused every hop, same as propagate()
        rel_dims = (
            edges.select("rel")
            .distinct()
            .select(
                "rel",
                F.posexplode(
                    token_vector_expr(F.col("rel"), self.dim, self.seed, self.hash_fn)
                ).alias("dim", "rv"),
            )
        )
        long = _to_long(feat0)
        for _ in range(self.depth):
            msgs = (
                edges.join(long.withColumnRenamed("id", "tail"), "tail")
                .join(F.broadcast(rel_dims), ["rel", "dim"])
                .groupBy(F.col("head").alias("id"), F.col("dim"))
                .agg(F.sum(F.col("val") * F.col("w") * F.col("rv")).alias("val"))
            )
            norm = msgs.groupBy("id").agg(
                F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("_n")
            )
            long = msgs.join(norm, "id").select(
                "id",
                "dim",
                (F.col("val") / F.when(F.col("_n") > 0, F.col("_n")).otherwise(1.0)).alias("val"),
            )
        return _to_array(long)
