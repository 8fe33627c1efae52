"""BPE training/application vs a naive single-machine reference model."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.bpe import apply_merges, bpe_token_stats, bpe_train


def naive_bpe(word_counts: dict[str, int], iters: int):
    """Classic dictionary BPE (Sennrich 2016, Algorithm 1) with the
    engine's tie-break (count DESC, left ASC, right ASC)."""
    vocab = {tuple(list(w) + ["_"]): c for w, c in word_counts.items()}
    merges = []
    for r in range(iters):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, a, b, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges, vocab


def _counts(docs: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for d in docs:
        for w in re.split(r"[^a-z0-9]+", d.lower()):
            if w:
                c[w] += 1
    return dict(c)


DOCS = [
    "low lower lowest newer newest wide wider widest",
    "low low lower new newer newest widen widen",
    "slow slower slowest lowland newland wideland",
    "aaaa aaab aabb abab baba",
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string")


def test_bpe_train_matches_naive(docs_df):
    merges, rep = bpe_train(docs_df, "text", iters=8)
    want, _ = naive_bpe(_counts(DOCS), 8)
    assert merges == want
    rep.unpersist()


def test_bpe_greedy_leftmost(spark):
    """'aaaa' with merge (a,a) must segment as [aa, aa], not [aa, a, a] —
    the double-space padding makes literal replace reproduce greedy
    leftmost-first merging."""
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], "doc_id long, text string")
    merges, rep = bpe_train(df, "text", iters=1)
    assert merges[0][1:3] == ("a", "a")
    seg = {r["w"]: r["n_subwords"] for r in apply_merges(rep).collect()}
    # aaaa -> [aa, aa, _] = 3 subword symbols
    assert seg["aaaa"] == 3
    rep.unpersist()


def test_bpe_segmentation_matches_naive(docs_df):
    _merges, rep = bpe_train(docs_df, "text", iters=8)
    _, vocab = naive_bpe(_counts(DOCS), 8)
    got = {r["w"]: r["n_subwords"] for r in apply_merges(rep).collect()}
    # reconstruct the word from symbols: concatenation minus the EOW char
    want = {"".join(syms)[:-1]: len(syms) for syms in vocab}
    assert got == want
    rep.unpersist()


def test_bpe_token_stats_consistent(docs_df):
    df = docs_df.withColumn("source", F.lit("s0"))
    out = bpe_token_stats(df, "text", "source", iters=4).collect()
    assert len(out) == 1
    row = out[0]
    n_words = sum(_counts(DOCS).values())
    assert row["n_words"] == n_words
    assert row["n_bpe_tokens"] >= row["n_words"]  # every word has >= 1 subword + EOW
