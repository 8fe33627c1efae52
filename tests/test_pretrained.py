"""KeyedVectorsEncoder (M1/M2) with a deterministic mock KeyedVectors —
model-free, mirroring the reference's ``tests/mocks.py:6-25``."""

import hashlib

import numpy as np
import pytest

from klinker_spark.encoders.pretrained import KeyedVectorsEncoder, load_keyed_vectors

DIM = 4


def _make_factory():
    """Factory built as a CLOSURE so cloudpickle ships it by value —
    a module-level test class would be pickled by reference and fail
    to import on executor workers (tests/ is not on their path)."""

    def factory():
        import hashlib as _hashlib

        import numpy as _np

        class _MockKV:
            """Deterministic vectors from md5(token); tokens starting
            with 'oov' are out-of-vocabulary (KeyError, like gensim)."""

            def __getitem__(self, tok: str):
                if tok.startswith("oov"):
                    raise KeyError(tok)
                h = _hashlib.md5(tok.encode()).digest()
                return _np.frombuffer(h[:8], dtype=_np.uint16).astype(_np.float64) / 65535.0

        return _MockKV()

    return factory


mock_kv_factory = _make_factory()


def _vec(tok):
    h = hashlib.md5(tok.encode()).digest()
    return np.frombuffer(h[: DIM * 2], dtype=np.uint16).astype(np.float64) / 65535.0


def test_mean_pooling_matches_reference_semantics(spark):
    df = spark.createDataFrame(
        [
            ("e1", "alpha beta"),
            ("e2", "alpha alpha gamma"),
            ("e3", "oovword oovother"),  # all tokens OOV -> no row
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: np.array(r["vector"])
        for r in KeyedVectorsEncoder(mock_kv_factory).encode(df).collect()
    }
    assert set(out) == {"e1", "e2"}  # e3 dropped (ref keeps random init)
    np.testing.assert_allclose(out["e1"], (_vec("alpha") + _vec("beta")) / 2, rtol=1e-12)
    # duplicate tokens count twice — mean over token OCCURRENCES
    np.testing.assert_allclose(
        out["e2"], (2 * _vec("alpha") + _vec("gamma")) / 3, rtol=1e-12
    )


def test_sif_pooling_weights_and_divisor(spark):
    # corpus: alpha x3, beta x1 -> weight(tok) = a/(a + freq/total)
    df = spark.createDataFrame(
        [("e1", "alpha beta"), ("e2", "alpha alpha")], ["id", "text"]
    )
    a = 1e-3
    w_alpha = a / (a + 3 / 4)
    w_beta = a / (a + 1 / 4)
    out = {
        r["id"]: np.array(r["vector"])
        for r in KeyedVectorsEncoder(mock_kv_factory, pooling="sif", sif_a=a)
        .encode(df)
        .collect()
    }
    # ref weighted_embed divides by token COUNT, not weight sum
    np.testing.assert_allclose(
        out["e1"], (w_alpha * _vec("alpha") + w_beta * _vec("beta")) / 2, rtol=1e-12
    )
    np.testing.assert_allclose(out["e2"], w_alpha * _vec("alpha"), rtol=1e-12)


def test_sif_min_freq_floor(spark):
    # min_freq above beta's count -> beta weight 1.0 (ref sif_weighting)
    df = spark.createDataFrame(
        [("e1", "alpha beta"), ("e2", "alpha alpha")], ["id", "text"]
    )
    a = 1e-3
    w_alpha = a / (a + 3 / 4)
    out = {
        r["id"]: np.array(r["vector"])
        for r in KeyedVectorsEncoder(mock_kv_factory, pooling="sif", sif_a=a, min_freq=2)
        .encode(df)
        .collect()
    }
    np.testing.assert_allclose(
        out["e1"], (w_alpha * _vec("alpha") + 1.0 * _vec("beta")) / 2, rtol=1e-12
    )


def test_factory_memoized_per_process():
    kv1 = load_keyed_vectors(mock_kv_factory)
    kv2 = load_keyed_vectors(mock_kv_factory)
    assert kv1 is kv2


def test_string_source_without_gensim_raises():
    pytest.importorskip_fail = None
    try:
        import gensim  # noqa: F401

        pytest.skip("gensim unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="factory callable"):
        load_keyed_vectors("glove-wiki-gigaword-300")


def test_invalid_pooling_rejected():
    with pytest.raises(ValueError, match="pooling"):
        KeyedVectorsEncoder(mock_kv_factory, pooling="max")


def _make_st_factory():
    """Sentence-encoder mock shipped by value (closure) — deterministic
    md5-derived sentence vectors, sentence-transformers encode() API."""

    def factory():
        import hashlib as _hashlib

        import numpy as _np

        class _MockST:
            def encode(self, texts):
                out = []
                for t in texts:
                    h = _hashlib.md5(t.encode()).digest()
                    out.append(
                        _np.frombuffer(h[:8], dtype=_np.uint16).astype(_np.float64)
                        / 65535.0
                    )
                return _np.stack(out)

        return _MockST()

    return factory


mock_st_factory = _make_st_factory()


def test_transformer_frame_encoder(spark):
    from klinker_spark.encoders.pretrained import TransformerFrameEncoder

    df = spark.createDataFrame(
        [("e1", "John Doe"), ("e2", "Jane Doe"), ("e3", None)], ["id", "text"]
    )
    out = {
        r["id"]: np.array(r["vector"])
        for r in TransformerFrameEncoder(mock_st_factory, batch_size=2)
        .encode(df)
        .collect()
    }
    assert set(out) == {"e1", "e2", "e3"}

    def vec(t):
        h = hashlib.md5(t.encode()).digest()
        return np.frombuffer(h[:8], dtype=np.uint16).astype(np.float64) / 65535.0

    np.testing.assert_allclose(out["e1"], vec("John Doe"), rtol=1e-12)
    np.testing.assert_allclose(out["e3"], vec(""), rtol=1e-12)  # null -> ""


def test_transformer_encoder_feeds_knn_builder(spark):
    """End-to-end M4/M5 shape: transformer embeddings -> kNN blocks."""
    from klinker_spark.embedding.blockbuilder import KNNBlockBuilder
    from klinker_spark.encoders.pretrained import TransformerFrameEncoder

    enc = TransformerFrameEncoder(mock_st_factory)
    l = enc.encode(spark.createDataFrame([("l1", "alpha"), ("l2", "beta")], ["id", "text"]))
    r = enc.encode(spark.createDataFrame([("r1", "alpha"), ("r2", "gamma")], ["id", "text"]))
    bm = KNNBlockBuilder(k=1).build_blocks(l, r, "L", "R")
    pairs = {(p["left_id"], p["right_id"]) for p in bm.block_pairs().collect()}
    assert ("l1", "r1") in pairs  # identical text -> identical vector


def test_transformer_string_source_without_library():
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("sentence-transformers unexpectedly installed")
    except ImportError:
        pass
    from klinker_spark.encoders.pretrained import load_sentence_encoder

    with pytest.raises(ImportError, match="factory"):
        load_sentence_encoder("all-MiniLM-L6-v2")
