"""Product-quantization ANN (ops/pq.py): codebook training, encoding,
asymmetric-distance search — numpy-reference checked, impl parity,
partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.pq import ann_topk_pq, pq_encode, pq_train


def _emb(spark, n=24, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>"), v


def _np_codebooks(emb_df):
    return pq_train(emb_df, m=4, k_codes=4, quantizer="hash_sample")


def test_pq_train_hash_sample_shapes_and_determinism(spark):
    emb, _ = _emb(spark)
    cb1 = _np_codebooks(emb)
    cb2 = _np_codebooks(emb.repartition(5))
    assert len(cb1) == 4 and len(cb1[0]) == 4 and len(cb1[0][0]) == 4
    assert cb1 == cb2  # md5 ordering: partition-layout independent


def test_pq_encode_matches_numpy_argmin(spark):
    emb, v = _emb(spark)
    cb = _np_codebooks(emb)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    cbn = np.asarray(cb)
    for i in range(len(v)):
        want = [
            int(((v[i, s * 4 : (s + 1) * 4][None, :] - cbn[s]) ** 2).sum(1).argmin())
            for s in range(4)
        ]
        assert got[i] == want, i


def test_pq_encode_numpy_path_parity(spark, monkeypatch):
    import klinker_spark.ops.pq as pqmod

    emb, _ = _emb(spark)
    cb = _np_codebooks(emb)
    expr = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    monkeypatch.setattr(pqmod, "PQ_LITERAL_MAX_CELLS", 0)  # force mapInPandas
    fast = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    assert expr == fast


def test_ann_topk_pq_adc_matches_numpy_and_impl_parity(spark):
    emb, v = _emb(spark)
    cb = _np_codebooks(emb)
    codes_df = pq_encode(emb, cb)
    q = emb.where(F.col("vec_id") < 5)

    def rows(impl):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["dist"], 9))
            for r in ann_topk_pq(q, codes_df, cb, k=3, impl=impl).collect()
        }

    got = rows("matmul")
    assert rows("expr") == got
    # numpy ADC reference
    cbn = np.asarray(cb)
    codes = {r["vec_id"]: np.array(r["codes"]) for r in codes_df.collect()}
    for qi in range(5):
        d = {}
        for nid, c in codes.items():
            d[nid] = sum(
                ((v[qi, s * 4 : (s + 1) * 4] - cbn[s][c[s]]) ** 2).sum()
                for s in range(4)
            )
        want = sorted(d, key=lambda nid: (d[nid], nid))[:3]
        for rk, nid in enumerate(want, 1):
            g_nid, g_dist = got[(qi, rk)]
            assert g_nid == nid
            assert g_dist == pytest.approx(d[nid], abs=1e-9)


def test_ann_topk_pq_partition_invariance_and_self_hit(spark):
    emb, _ = _emb(spark, n=30)
    cb = pq_train(emb, m=4, k_codes=8)
    codes_df = pq_encode(emb, cb)
    q = emb.where(F.col("vec_id") % 7 == 0)
    a = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk_pq(q, codes_df, cb, k=5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk_pq(q.repartition(3), codes_df.repartition(11), cb, k=5).collect()
    }
    assert a == b
    # every query's own vector appears in its top-k (ADC dist to self is
    # the pure quantization error, minimal among same-code candidates)
    for qid in {k[0] for k in a}:
        assert qid in {a[(qid, r)] for r in range(1, 6)}


def test_pq_train_validates_divisibility(spark):
    emb, _ = _emb(spark, dim=10)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=4)


def test_ivfpq_build_search_parity_and_pruning(spark, tmp_path):
    """IVF-PQ: matmul and expr impls agree exactly; the probed scan
    partition-prunes (unprobed list directories never open); most
    queries find their own vector in the ADC top-k."""
    import io
    import contextlib

    from klinker_spark.ops.pq import ann_topk_ivfpq, build_ivfpq_index

    emb, _ = _emb(spark, n=60, dim=16, seed=9)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=4, m=4, k_codes=8)
    q = emb.where(F.col("vec_id") % 6 == 0)

    def rows(impl):
        return {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["dist"], 9))
            for r in ann_topk_ivfpq(q, path, k=5, n_probe=2, impl=impl).collect()
        }

    got = rows("matmul")
    assert rows("expr") == got
    assert len({k[0] for k in got}) == 10
    # with n_probe = all centroids, every query's own vector is in its
    # top-k (its ADC dist is the pure quantization error)
    full = ann_topk_ivfpq(q, path, k=5, n_probe=4).collect()
    by_q: dict = {}
    for r in full:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for qid, nbrs in by_q.items() if qid in nbrs)
    assert hits >= 8  # PQ is approximate; codes can collide

    # partition pruning visible in the scan plan
    df = ann_topk_ivfpq(q, path, k=5, n_probe=1, impl="expr")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_ivfpq_kmeans_quantizer_runs(spark, tmp_path):
    from klinker_spark.ops.pq import ann_topk_ivfpq, build_ivfpq_index

    emb, _ = _emb(spark, n=40, dim=8, seed=1)
    path = str(tmp_path / "ivfpq_km")
    build_ivfpq_index(emb, path, n_centroids=3, m=2, k_codes=4, quantizer="kmeans")
    out = ann_topk_ivfpq(emb.where(F.col("vec_id") < 4), path, k=3, n_probe=2)
    assert out.count() == 12


def test_build_ivfpq_empty_input_raises(spark, tmp_path):
    """Empty index frame fails with a descriptive ValueError at the
    coarse-centroid sample, not a bare IndexError (r4 advice)."""
    import pytest

    from klinker_spark.ops.pq import build_ivfpq_index

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        build_ivfpq_index(emb, str(tmp_path / "ix"), n_centroids=4, m=4, k_codes=8)
