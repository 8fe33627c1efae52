"""Pretrained word-embedding encoders (M1 mean pooling / M2 SIF
weighting) backed by gensim ``KeyedVectors``, loaded lazily on each
executor.

Reference behavior: ``src/klinker/encoders/pretrained.py:259-384``
(``TokenizedWordEmbedder.embed/weighted_embed``, ``encode_frame``) and
``:427-516`` (``SIFEmbeddingTokenizedFrameEncoder.prepare``).

Spark-first shape — everything except the model lookup stays in
Catalyst:

- tokenization: the shared ``tokenize`` expression (explode, JVM-side);
- SIF weights: a corpus aggregate + broadcast join, exactly the
  ``SIFHashingWordEmbedder`` plan (one shuffle, map-side partials);
- pooling: ``groupBy(id).applyInPandas`` over ``(id, token, weight)``
  rows — the ONLY Python step, Arrow-batched, one BLAS mean per
  entity.

The model is never shipped through the task closure (a 3 GB
fasttext model would be re-pickled per task): executors resolve
``source`` themselves — a filesystem path (``KeyedVectors.load`` with
``mmap="r"``, so concurrent task processes share pages), a
gensim-downloader name, or a picklable zero-arg factory (how tests
inject a deterministic mock, mirroring the reference's
``tests/mocks.py:6-25`` MockKeyedVector) — and memoize per process.

Entities whose every token is out-of-vocabulary produce NO row (the
reference leaves them at their random xavier init,
``pretrained.py:375-384``); compose with
``encoders.hashing.initialize_and_fill`` to reproduce that fill.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = [
    "KeyedVectorsEncoder",
    "load_keyed_vectors",
    "TransformerFrameEncoder",
    "load_sentence_encoder",
]

#: per-executor-process model cache (a worker reuse survives tasks)
_KV_CACHE: dict = {}


def load_keyed_vectors(source: str | Callable[[], object]):
    """Resolve ``source`` to a KeyedVectors-like object, memoized per
    process.

    - ``str`` path that exists → ``KeyedVectors.load(path, mmap="r")``;
    - other ``str`` → ``gensim.downloader.load(name)`` (e.g.
      ``"glove-wiki-gigaword-300"`` — the reference's
      ``_gensim_mapping_download`` targets, ``pretrained.py:269-273``);
    - zero-arg callable → called once (test/mocking hook; must be
      picklable, i.e. a module-level function).

    The object only needs ``kv[token] -> 1-d vector`` raising
    ``KeyError`` for out-of-vocabulary tokens — gensim's KeyedVectors
    API, which the reference consumes the same way
    (``pretrained.py:345-350``).
    """
    key = source if isinstance(source, str) else f"{source.__module__}.{source.__qualname__}"
    kv = _KV_CACHE.get(key)
    if kv is None:
        if callable(source):
            kv = source()
        else:
            try:
                from gensim.models import KeyedVectors
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "gensim is not installed; pass a zero-arg factory callable "
                    "returning a KeyedVectors-like object instead of a name/path"
                ) from e
            import os

            if os.path.exists(source):
                kv = KeyedVectors.load(source, mmap="r")
            else:  # pragma: no cover - needs network
                import gensim.downloader

                kv = gensim.downloader.load(source)
        _KV_CACHE[key] = kv
    return kv


class KeyedVectorsEncoder:
    """M1 (mean) / M2 (SIF) pooling over pretrained word vectors.

    ``pooling="mean"``: unweighted token-vector average
    (``TokenizedWordEmbedder.embed``).  ``pooling="sif"``: smooth
    inverse frequency weights ``a / (a + freq/total)`` with tokens
    under ``min_freq`` weighted 1.0
    (``SIFEmbeddingTokenizedFrameEncoder.prepare:496-508``); following
    ``weighted_embed:339-352`` the pooled vector divides by the token
    COUNT, not the weight sum.  First-PC removal is composable via
    ``encoders.hashing.remove_first_pc`` (same split as the hashing
    stack).
    """

    def __init__(
        self,
        source: str | Callable[[], object],
        pooling: str = "mean",
        sif_a: float = 1e-3,
        min_freq: int = 0,
        min_token_length: int = 3,
    ):
        if pooling not in ("mean", "sif"):
            raise ValueError(f"pooling must be mean|sif, got {pooling!r}")
        self.source = source
        self.pooling = pooling
        self.sif_a = sif_a
        self.min_freq = min_freq
        self.min_token_length = min_token_length

    def _weighted_tokens(self, conc: DataFrame) -> DataFrame:
        # keep_duplicates: pooling weights count token OCCURRENCES
        # (ref weighted_embed iterates tokens, not the token set)
        tokens = conc.select(
            "id",
            F.explode(
                tokenize("text", self.min_token_length, keep_duplicates=True)
            ).alias("token"),
        ).where(F.col("token") != "")
        if self.pooling == "mean":
            return tokens.withColumn("weight", F.lit(1.0))
        freq = tokens.groupBy("token").agg(F.count("*").alias("freq"))
        # corpus total as a 1-row broadcast aggregate — no driver job
        total = tokens.select(F.count("*").alias("_total"))
        weights = freq.crossJoin(F.broadcast(total)).select(
            "token",
            F.when(
                F.col("freq") >= F.lit(self.min_freq),
                self.sif_a / (self.sif_a + F.col("freq") / F.col("_total")),
            )
            .otherwise(F.lit(1.0))
            .alias("weight"),
        )
        return tokens.join(F.broadcast(weights), "token").select("id", "token", "weight")

    def encode(self, conc: DataFrame) -> DataFrame:
        """``(id, text)`` → ``(id, vector array<double>)``."""
        source = self.source
        id_type = conc.schema["id"].dataType.simpleString()

        def pool(pdf):
            import numpy as np
            import pandas as pd

            kv = load_keyed_vectors(source)
            embedded = []
            for tok, w in zip(pdf["token"], pdf["weight"]):
                try:
                    v = np.asarray(kv[tok], dtype=np.float64)
                except KeyError:
                    # ref counts & skips unknown tokens (pretrained.py:346-350)
                    continue
                embedded.append(v * w)
            if not embedded:
                return pd.DataFrame(
                    {
                        "id": pd.Series([], dtype=object),
                        "vector": pd.Series([], dtype=object),
                    }
                )
            emb = np.mean(np.vstack(embedded), axis=0)
            return pd.DataFrame({"id": [pdf["id"].iloc[0]], "vector": [emb.tolist()]})

        # narrow-ok: grouped kernel — one output row per entity id;
        # the groupBy shuffle distributes ids across all reducers
        return self._weighted_tokens(conc).groupBy("id").applyInPandas(
            pool, schema=f"id {id_type}, vector array<double>"
        )


def load_sentence_encoder(source: str | Callable[[], object]):
    """Resolve ``source`` to a sentence-encoder object, memoized per
    executor process (same cache as :func:`load_keyed_vectors`).

    - ``str`` → ``sentence_transformers.SentenceTransformer(name)``
      (optional import — torch is not in this environment);
    - zero-arg callable → called once (test/mocking hook).

    The object needs ``encode(list[str]) -> 2-d array-like`` — the
    sentence-transformers API the reference consumes
    (``pretrained.py:129-256``, ``SentenceTransformerTokenizedFrameEncoder``).
    """
    key = (
        f"st::{source}"
        if isinstance(source, str)
        else f"st::{source.__module__}.{source.__qualname__}"
    )
    model = _KV_CACHE.get(key)
    if model is None:
        if callable(source):
            model = source()
        else:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "sentence-transformers/torch are not installed; pass a "
                    "zero-arg factory returning an object with "
                    "encode(list[str]) -> ndarray"
                ) from e
            model = SentenceTransformer(source)  # pragma: no cover
        _KV_CACHE[key] = model
    return model


class TransformerFrameEncoder:
    """M4/M5: transformer / sentence-transformer frame encoder —
    ``(id, text)`` → ``(id, vector)`` through Arrow-batched
    ``mapInPandas``.

    Reference: ``pretrained.py:55-256`` (``TransformerTokenizedFrame
    Encoder`` / ``SentenceTransformerTokenizedFrameEncoder``) runs the
    forward pass on the driver over pandas batches; here each EXECUTOR
    loads the model once (memoized per process, never shipped through
    the closure — a GPU cluster points ``spark.task.resource.gpu`` at
    the same stage) and forwards one Arrow batch at a time, so a 100 TB
    corpus encodes as an embarrassingly parallel scan.

    ``batch_size`` sub-batches each Arrow batch before the forward pass
    (the reference's ``batch_size``); ``max_length`` truncation belongs
    to the model/factory config.  The environment here has no torch —
    string sources raise ImportError with guidance; tests inject a
    deterministic factory, which exercises every line of the Spark
    plumbing (the stub boundary is the model object, never the plan).
    """

    def __init__(self, source: str | Callable[[], object], batch_size: int = 512):
        self.source = source
        self.batch_size = batch_size

    def encode(self, conc: DataFrame) -> DataFrame:
        source, bs = self.source, self.batch_size
        id_type = conc.schema["id"].dataType.simpleString()

        def run(batches):
            import numpy as np
            import pandas as pd

            model = load_sentence_encoder(source)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vecs = []
                texts = pdf["text"].fillna("").tolist()
                for lo in range(0, len(texts), bs):
                    out = np.asarray(model.encode(texts[lo : lo + bs]), dtype=np.float64)
                    vecs.extend(v.tolist() for v in out)
                yield pd.DataFrame({"id": pdf["id"], "vector": vecs})

        from ..session import widen_for_kernel

        return widen_for_kernel(conc.select("id", "text")).mapInPandas(
            run, schema=f"id {id_type}, vector array<double>"
        )
