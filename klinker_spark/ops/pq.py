"""Product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
Quantization for Nearest Neighbor Search") — the memory-compressed
search family beyond the engine's IVF/LSH paths.

Why it matters at 100 TB: a 768-dim float32 corpus is 3 KB/vector; PQ
stores ``m`` one-byte codes (m=8-64), a 50-400× compression, so the
searchable representation of a billion-vector corpus fits in cluster
RAM.  Search uses asymmetric distance computation (ADC): per query,
one small ``m × k_codes`` lookup table of exact subspace distances,
then every candidate costs ``m`` table lookups instead of ``dim``
multiply-adds.

Spark decomposition:

- ``pq_train``  — codebooks, driver-side like every quantizer fit here
  (``hash_sample``: the ``k_codes`` md5-ranked vectors sliced per
  subspace — deterministic, any engine reproduces it, giving the whole
  pipeline an exact DuckDB oracle; ``kmeans``: per-subspace MLlib fits,
  better codebooks, rows-only checkable);
- ``pq_encode`` — one stateless projection: per subspace, argmin
  squared-L2 over the literal codebook (Catalyst expressions under
  ``PROJECT_LITERAL_MAX_CELLS``, broadcast-numpy ``mapInPandas``
  above);
- ``ann_topk_pq`` — the codes table streams through ``mapInPandas`` in
  whatever partitioning it has (never shuffled, the
  ``topk_cosine_sharded`` scan-in-place shape); queries + codebooks
  broadcast; each task emits its local top-k per query and one window
  merges ``n_partitions · |Q| · k`` scalar candidate rows.  ``expr``
  impl keeps the whole plan in Catalyst for the oracle.

Distances are squared L2 (the PQ-standard metric); on unit-norm
vectors ``d² = 2 − 2·cos``, so rankings match the cosine family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_train", "pq_encode", "ann_topk_pq"]

#: Literal-expression budget for encode/ADC expressions — same guard
#: family as PROBE_LITERAL_MAX_CENTROIDS (NOTES lesson 7).
PQ_LITERAL_MAX_CELLS = 4096


def pq_train(
    index: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    quantizer: str = "hash_sample",
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: ``codebooks[s][c]`` = code ``c`` of subspace
    ``s`` (each a ``dim/m``-float list).  ``dim`` must divide by ``m``.

    ``hash_sample``: codes are the first ``k_codes`` vectors ordered by
    ``(md5(id), id)``, sliced per subspace — zero fit iterations,
    deterministic across engines (the exact-oracle mode, same recipe as
    the IVF ``hash_sample`` quantizer).  ``kmeans``: one MLlib KMeans
    per subspace over the sliced vectors (m tiny driver-side fits over
    distributed data).
    """
    ix = index.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vector")
    )
    first = ix.select(F.size("vector").alias("d")).first()
    dim = int(first["d"]) if first else 0
    if dim == 0 or dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    if quantizer == "hash_sample":
        rows = (
            ix.withColumn("_h", F.md5(F.col("id").cast("string")))
            .orderBy("_h", "id")
            .limit(k_codes)
            .collect()
        )
        return [
            [[float(x) for x in r["vector"][s * ds : (s + 1) * ds]] for r in rows]
            for s in range(m)
        ]
    if quantizer != "kmeans":
        raise ValueError(f"quantizer must be hash_sample|kmeans, got {quantizer!r}")
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    books = []
    sliced = ix.select(
        *[F.slice("vector", s * ds + 1, ds).alias(f"s{s}") for s in range(m)]
    ).persist()
    try:
        for s in range(m):
            feat = sliced.select(array_to_vector(F.col(f"s{s}")).alias("features"))
            model = KMeans(
                k=k_codes, seed=seed + s, featuresCol="features", maxIter=10
            ).fit(feat)
            books.append([[float(x) for x in c] for c in model.clusterCenters()])
    finally:
        sliced.unpersist()
    return books


def _sqdist_expr(sub, code: list):
    """Σ (sub[j] − code[j])² as a sequential left fold — the same
    float-op order as the DuckDB oracle's indexed-lambda ``list_sum``."""
    lit = F.array(*[F.lit(float(x)) for x in code])
    return F.aggregate(
        F.zip_with(sub, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, vector)`` → ``(id_col, codes array<int>)``: per subspace the
    argmin-squared-L2 code (ties → lowest code id).  Pure Catalyst
    under the literal budget, broadcast-numpy ``mapInPandas`` above —
    either way a stateless projection, zero shuffle.
    """
    m = len(codebooks)
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    ix = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vector")
    )
    if m * k * ds <= PQ_LITERAL_MAX_CELLS:
        code_cols = []
        for s in range(m):
            sub = F.slice("vector", s * ds + 1, ds)
            dists = F.array(*[_sqdist_expr(sub, c) for c in codebooks[s]])
            code_cols.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
        return ix.select(F.col("id").alias(id_col), F.array(*code_cols).alias("codes"))

    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, ds)
    id_type = ix.schema["id"].dataType.simpleString()

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            v = np.stack(pdf["vector"].to_numpy()).astype(np.float64)
            n = len(pdf)
            codes = np.empty((n, cb.shape[0]), dtype=np.int32)
            for s in range(cb.shape[0]):
                sub = v[:, s * cb.shape[2] : (s + 1) * cb.shape[2]]
                d = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d.argmin(axis=1)  # argmin: first (lowest) on ties
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    return ix.mapInPandas(encode, schema=f"id {id_type}, codes array<int>").withColumnRenamed(
        "id", id_col
    )


def ann_topk_pq(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id: str = "vec_id",
    index_id: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "matmul",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-coded index.

    Output: ``(query_id, neighbor_id, dist, rank)`` — ``dist`` the ADC
    squared-L2 approximation, rank 1..k by ``dist ASC, neighbor_id
    ASC`` (total order; partition layout cannot change results).

    ``matmul`` (default): queries + codebooks broadcast as numpy; the
    codes table streams through ``mapInPandas`` IN PLACE — per batch
    one ``(m,k,|Q|)`` distance-table gather scores every candidate in
    ``m`` lookups, and only per-partition top-k survivors reach the
    single merge window.  ``expr``: the same arithmetic as Catalyst
    expressions (literal codebooks) — the oracle-shaped baseline.
    """
    import numpy as np

    m = len(codebooks)
    ds = len(codebooks[0][0])
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    if impl == "expr":
        # dist table inlined: Σ_s ||q_sub − cb[s][code_s]||², each
        # subspace a literal-codebook element_at lookup
        terms = []
        for s in range(m):
            sub = F.slice("qv", s * ds + 1, ds)
            cb_lit = F.array(
                *[F.array(*[F.lit(float(x)) for x in c]) for c in codebooks[s]]
            )
            chosen = F.element_at(cb_lit, F.element_at("codes", s + 1) + 1)
            terms.append(
                F.aggregate(
                    F.zip_with(sub, chosen, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        dist = terms[0]
        for t in terms[1:]:
            dist = dist + t
        cand = q.crossJoin(codes.select(F.col(index_id).alias("neighbor_id"), "codes")).select(
            "query_id", "neighbor_id", dist.alias("dist")
        )
        return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if impl != "matmul":
        raise ValueError(f"impl must be matmul|expr, got {impl!r}")

    qrows = q.collect()  # queries are the broadcast side by contract
    qids = [r["query_id"] for r in qrows]
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    codes = codes.select(F.col(index_id).alias("id"), "codes")
    id_type = codes.schema["id"].dataType.simpleString()
    q_type = q.schema["query_id"].dataType.simpleString()
    kk = int(k)

    def search(batches):
        import pandas as pd

        if len(qids) == 0:
            return
        # T[s][c][qi] = ||q_sub − code||² — exact subspace distances
        T = np.stack(
            [
                (
                    (qmat[:, s * ds : (s + 1) * ds][:, None, :] - cb[s][None, :, :]) ** 2
                ).sum(axis=2).T  # (k, |Q|)
                for s in range(cb.shape[0])
            ]
        )  # (m, k, |Q|)
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
            gathered = T[np.arange(cb.shape[0])[:, None], c.T, :]  # (m, B, |Q|)
            d = gathered.sum(axis=0)  # (B, |Q|)
            nb = min(kk, d.shape[0])
            part = np.argpartition(d, nb - 1, axis=0)[:nb]  # (nb, |Q|) batch-local top
            for qi in range(d.shape[1]):
                rows_i = part[:, qi]
                yield pd.DataFrame(
                    {
                        "query_id": [qids[qi]] * len(rows_i),
                        "neighbor_id": pdf["id"].to_numpy()[rows_i],
                        "dist": d[rows_i, qi],
                    }
                )

    cand = codes.mapInPandas(
        search, schema=f"query_id {q_type}, neighbor_id {id_type}, dist double"
    )
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
