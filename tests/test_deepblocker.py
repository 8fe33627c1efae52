"""Invariant tests for the torch-free DeepBlocker analogues (M6-M8)."""

import pytest
from pyspark.sql import functions as F

from klinker_spark.encoders.deepblocker import (
    AutoencoderFrameEncoder,
    CrossTupleTrainingEncoder,
    HybridDeepBlockerEncoder,
)


@pytest.fixture
def conc_pair(spark):
    left = spark.createDataFrame(
        [
            ("a1", "red apple sweet fruit orchard"),
            ("a2", "green pear juicy fruit orchard"),
            ("a3", "fast car engine wheel road"),
            ("a4", "slow truck diesel wheel road"),
        ],
        "id string, text string",
    )
    right = spark.createDataFrame(
        [
            ("b1", "red apple sweet fruit garden"),
            ("b2", "fast car engine wheel street"),
        ],
        "id string, text string",
    )
    return left, right


def _cos(u, v):
    d = sum(a * b for a, b in zip(u, v))
    nu = sum(a * a for a in u) ** 0.5
    nv = sum(b * b for b in v) ** 0.5
    return d / (nu * nv) if nu and nv else 0.0


def test_autoencoder_shapes_and_projection(spark, conc_pair):
    left, right = conc_pair
    enc = AutoencoderFrameEncoder(out_dim=3, in_dim=16)
    le, re_ = enc.fit_encode(left, right)
    lv = {r["id"]: r["vector"] for r in le.collect()}
    rv = {r["id"]: r["vector"] for r in re_.collect()}
    assert set(lv) == {"a1", "a2", "a3", "a4"} and set(rv) == {"b1", "b2"}
    assert all(len(v) == 3 for v in lv.values())
    # near-duplicate texts stay closer than unrelated ones post-projection
    assert _cos(lv["a1"], rv["b1"]) > _cos(lv["a3"], rv["b1"])


def test_ctt_reweighting(spark, conc_pair):
    left, right = conc_pair
    enc = CrossTupleTrainingEncoder(dim=16)
    le, re_ = enc.fit_encode(left, right)
    lv = {r["id"]: r["vector"] for r in le.collect()}
    assert all(len(v) == 16 for v in lv.values())
    # weights are |coef| ≥ 0 → no sign flips vs base embedding direction
    assert _cos(lv["a1"], {r["id"]: r["vector"] for r in re_.collect()}["b1"]) > 0


def test_hybrid_stack(spark, conc_pair):
    left, right = conc_pair
    le, re_ = HybridDeepBlockerEncoder(out_dim=3, in_dim=16).fit_encode(left, right)
    lv = {r["id"]: r["vector"] for r in le.collect()}
    assert all(len(v) == 3 for v in lv.values())
    assert set(lv) == {"a1", "a2", "a3", "a4"}


def test_topk_pc_power_matches_numpy_svd(spark):
    """The deterministic power+deflation components align with numpy's
    top singular vectors on a cloud with clear spectral gaps (the
    convergence half; the determinism half is the exact DuckDB oracle
    on deepblocker_knn_blocking_md5)."""
    import numpy as np

    from klinker_spark.encoders.hashing import topk_pc_power

    rng = np.random.RandomState(0)
    basis = np.linalg.qr(rng.randn(6, 6))[0]
    scales = np.array([10.0, 5.0, 1.0, 0.5, 0.2, 0.1])
    pts = (rng.randn(300, 6) * scales) @ basis.T
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "id long, vector array<double>",
    )
    comps = topk_pc_power(df, k=2, sample_n=300, iters=60)
    _, _, vt = np.linalg.svd(pts, full_matrices=False)
    for c, v in zip(comps, vt[:2]):
        assert abs(abs(float(np.dot(c, v))) - 1.0) < 1e-3
    # deflation leaves the second component orthogonal to the first
    assert abs(float(np.dot(comps[0], comps[1]))) < 1e-6
