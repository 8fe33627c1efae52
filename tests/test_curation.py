"""Curation-operator tests: repetition filters, connected components
(propagation AND star contraction vs a Python union-find model on
random graphs), canonical dedup, stratified sampling invariants,
contamination, PII scrubbing, unigram-LM/DSIR scoring vs Python
models, sequence packing, token-budget mixing, span duplication,
int8 quantization, the streaming parity path, and the end-to-end
curate_corpus pipeline."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.curation import (
    canonical_dedup,
    connected_components,
    contamination_check,
    pii_scrub,
    repetition_stats,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ------------------------------------------------------------------ repetition
def test_repetition_stats_values(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),      # one bigram repeated everywhere
            (2, "x y z w"),          # all unique
            (3, "solo"),             # single token: no bigrams
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    # doc 1: tokens [a b a b a b] → 6 tokens, 2 distinct → dup 4/6
    assert out[1]["n_tokens"] == 6
    assert out[1]["dup_token_frac"] == round(1 - 2 / 6, 6)
    # bigrams: "a b"×3, "b a"×2 → total 5, top 3, dup 5
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[1]["dup_bigram_frac"] == 1.0
    assert out[1]["keep"] == 0
    # doc 2: no repetition at all
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert out[2]["dup_bigram_frac"] == 0.0
    # doc 3: degenerate — no bigrams, fractions all zero
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["dup_bigram_frac"] == 0.0
    assert out[3]["keep"] == 1


# ------------------------------------------------------------------ components
def _model_components(edges):
    """Union-find ground truth: id → min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for v in list(parent):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_random_graph(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(35)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["label"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == _model_components(edges)
    # the sub-threshold union-find fast path agrees exactly
    local = {r["id"]: r["label"] for r in connected_components(df).collect()}
    assert local == got


def test_connected_components_chain_transitivity(spark):
    # a path graph is the worst diameter case: 0-1-2-...-9 is ONE component
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["label"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert got == {i: 0 for i in range(10)}


def test_connected_components_self_loop_vertex_kept(spark):
    # a vertex whose only edge is (v, v) is incident to an edge and
    # must appear in the output as its own singleton component
    edges = [(5, 5), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    for thresh in (0, 100_000):  # distributed and local paths agree
        got = {
            r["id"]: r["label"]
            for r in connected_components(df, local_threshold=thresh).collect()
        }
        assert got == {1: 1, 2: 1, 5: 5}


def test_repetition_stats_null_text_keep_is_zero(spark):
    # NULL text must yield keep=0 (matching the oracle's CASE), never
    # a NULL that would flip the driver's value hash
    diverse = " ".join(chr(97 + i) + chr(97 + j) for i in range(5) for j in range(4))
    docs = spark.createDataFrame([(1, None), (2, diverse)], "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in repetition_stats(docs).collect()}
    assert out[1] == 0 and out[2] == 1


def test_dsir_empty_corpus_returns_empty(spark):
    from klinker_spark.ops.curation import dsir_importance

    docs = spark.createDataFrame([], "doc_id long, text string, is_target boolean")
    out = dsir_importance(docs, F.col("is_target"))
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "log_ratio"]


def test_connected_components_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, local_threshold=0)


def test_canonical_dedup_full_corpus(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["doc_a", "doc_b"])
    out = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"]) for r in canonical_dedup(docs, pairs).collect()}
    # {1,3,5} is one cluster with canonical 1; everyone else is its own
    assert out == {
        0: (0, 0), 1: (1, 0), 2: (2, 0), 3: (1, 1), 4: (4, 0), 5: (1, 1),
    }


def test_canonical_dedup_priority_survivor(spark):
    """priority_col keeps the highest-priority cluster member (ties by
    smallest id); pairless docs stay their own canonical."""
    rows = [(1, 10.0), (2, 5.0), (3, 30.0), (4, 30.0), (5, 7.0), (9, 1.0)]
    docs = spark.createDataFrame(rows, ["doc_id", "quality"])
    # cluster {1,3,5} (best: 3) and cluster {2,4} (best: 4); 9 alone
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 4)], ["doc_a", "doc_b"])
    out = {
        r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in canonical_dedup(docs, pairs, priority_col="quality").collect()
    }
    assert out == {
        1: (3, 1), 3: (3, 0), 5: (3, 1), 2: (4, 1), 4: (4, 0), 9: (9, 0),
    }
    # tie on priority falls back to the smallest id: make 1 tie with 3
    docs2 = spark.createDataFrame(
        [(1, 30.0), (2, 5.0), (3, 30.0), (4, 30.0), (5, 7.0), (9, 1.0)],
        ["doc_id", "quality"],
    )
    out2 = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_dedup(docs2, pairs, priority_col="quality").collect()
    }
    assert out2[1] == 1 and out2[3] == 1 and out2[5] == 1


# ------------------------------------------------------------------ sampling
def test_stratified_sample_quota_and_determinism(spark):
    rows = [(i, ["en", "de"][i % 2], f"s{i % 3}") for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    out1 = stratified_sample(docs, ["lang", "source"], 3).collect()
    out2 = stratified_sample(docs, ["lang", "source"], 3).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic
    per = {}
    for r in out1:
        per.setdefault((r["lang"], r["source"]), []).append(r["rk"])
    assert len(per) == 6
    for ranks in per.values():
        assert sorted(ranks) == [1, 2, 3]  # exact quota, dense ranks


def test_stratified_sample_small_stratum_keeps_all(spark):
    docs = spark.createDataFrame([(1, "en", "a"), (2, "de", "b")], ["doc_id", "lang", "source"])
    assert stratified_sample(docs, ["lang", "source"], 5).count() == 2


# ------------------------------------------------------------------ contamination
def test_contamination_check(spark):
    rows = [
        (1, "the quick brown fox jumps", "bench"),
        (2, "the quick brown fox sleeps here now", "web"),
        (3, "totally unrelated words only", "web"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r.asDict()
        for r in contamination_check(docs, F.col("source") == "bench").collect()
    }
    assert set(out) == {2, 3}  # benchmark doc itself excluded
    # doc2 3-grams: 5 total; "the quick brown" and "quick brown fox" hit
    assert out[2]["n_ngrams"] == 5
    assert out[2]["n_contaminated"] == 2
    assert out[2]["contamination"] == 0.4
    assert out[3]["n_contaminated"] == 0
    assert out[3]["contamination"] == 0.0


# ------------------------------------------------------------------ PII
def test_pii_scrub(spark):
    docs = _docs(
        spark,
        [
            (1, "contact john.doe@example.com or call 5551234567 ext 123"),
            (2, "no pii here"),
            (3, "cards 4111111111111111 and 378282246310005"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in pii_scrub(docs).collect()}
    assert out[1]["clean_text"] == "contact <EMAIL> or call <NUM> ext 123"
    assert (out[1]["n_emails"], out[1]["n_numbers"]) == (1, 1)
    assert out[2]["clean_text"] == "no pii here"
    assert (out[2]["n_emails"], out[2]["n_numbers"]) == (0, 0)
    assert out[3]["clean_text"] == "cards <NUM> and <NUM>"
    assert out[3]["n_numbers"] == 2
    # the email's digits are NOT double-counted as numbers
    docs2 = _docs(spark, [(9, "mail 12345@host1234.org now")])
    r = pii_scrub(docs2).collect()[0]
    assert r["clean_text"] == "mail <EMAIL> now"
    assert (r["n_emails"], r["n_numbers"]) == (1, 0)


# ------------------------------------------------------------------ quality / mixing
def _r(x, nd):
    """Spark/DuckDB ROUND semantics: HALF_UP on the shortest decimal
    repr (BigDecimal.valueOf path) — Python's round() is banker's and
    diverges on exact halves like -1.1835615."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def _micro(x):
    return int(_r(x * 1e6, 0))


def test_unigram_logprob_against_model(spark):
    import math

    from klinker_spark.ops.curation import unigram_logprob_quality

    rows = [(1, "a a b"), (2, "b c"), (3, "a c c")]
    docs = _docs(spark, rows)
    toks = [t for _, txt in rows for t in txt.split(" ")]
    n = len(toks)
    freq = {t: toks.count(t) for t in set(toks)}
    lp = {t: _micro(math.log(c / n)) for t, c in freq.items()}
    expect = {
        d: _r(sum(lp[t] for t in txt.split(" ")) / (1e6 * len(txt.split(" "))), 6)
        for d, txt in rows
    }
    got = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob_quality(docs).collect()}
    assert got == expect


def test_dsir_importance_against_model(spark):
    import math

    from klinker_spark.ops.curation import dsir_importance

    rows = [(1, "a a b", True), (2, "b c", False), (3, "a c c", False)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "is_target"])
    toks = [(t, tgt) for _, txt, tgt in rows for t in txt.split(" ")]
    n_all = len(toks)
    n_tgt = sum(1 for _, tgt in toks if tgt)
    vocab = len({t for t, _ in toks})
    c_all = {t: sum(1 for x, _ in toks if x == t) for t, _ in toks}
    c_tgt = {t: sum(1 for x, tgt in toks if x == t and tgt) for t, _ in toks}
    w = {
        t: _micro(
            math.log((c_tgt[t] + 1) / (n_tgt + vocab))
            - math.log((c_all[t] + 1) / (n_all + vocab))
        )
        for t in c_all
    }
    expect = {
        d: _r(sum(w[t] for t in txt.split(" ")) / 1e6, 6)
        for d, txt, tgt in rows
        if not tgt
    }
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir_importance(docs, F.col("is_target")).collect()
    }
    assert got == expect
    # target docs themselves are excluded from the scored output
    assert 1 not in got


def test_pack_sequences_invariants(spark):
    from klinker_spark.ops.curation import pack_sequences

    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(80)]
    docs = _docs(spark, rows)
    out = pack_sequences(docs, budget=20, n_groups=4).collect()
    assert len(out) == 80
    by_group = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    assert set(by_group) <= set(range(4))
    for rows_g in by_group.values():
        rows_g.sort(key=lambda r: r["start_offset"])
        # offsets are an exact prefix sum of token counts in group order
        run = 0
        for r in rows_g:
            assert r["start_offset"] == run
            assert r["bin_id"] == run // 20
            run += r["n_tokens"]
    # deterministic across runs
    again = pack_sequences(docs, budget=20, n_groups=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


# ------------------------------------------------------------------ streaming
def test_stateless_curation_ops_run_on_streams(spark, tmp_path):
    """pii_scrub, repetition_stats' per-row signals, and token counting
    are pure expressions, so the SAME operator code runs under
    Structured Streaming unchanged — file stream in, memory sink out,
    results identical to the batch run."""
    from klinker_spark.ops.curation import pii_scrub
    from klinker_spark.ops.textstats import token_count

    docs = spark.createDataFrame(
        [(1, "call 55512345 now"), (2, "plain words"), (3, "a@b.org wrote this")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    scrubbed = pii_scrub(stream)
    counted = token_count(stream)
    q1 = (
        scrubbed.writeStream.format("memory")
        .queryName("pii_stream")
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        counted.writeStream.format("memory")
        .queryName("tc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(60)
    q2.awaitTermination(60)

    got = sorted(map(tuple, spark.sql("select * from pii_stream").collect()))
    want = sorted(map(tuple, pii_scrub(docs).collect()))
    assert got == want
    got_tc = sorted(map(tuple, spark.sql("select * from tc_stream").collect()))
    want_tc = sorted(map(tuple, token_count(docs).collect()))
    assert got_tc == want_tc


# ------------------------------------------------------------------ star contraction
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_components_random_graph(spark, seed):
    rng = random.Random(seed)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(35)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["label"]
        for r in connected_components(df, algorithm="star", local_threshold=0).collect()
    }
    assert got == _model_components(edges)


def test_star_components_long_chain_logarithmic_rounds(spark):
    # a 60-node path has diameter 59: propagation would need ~60
    # rounds, star contraction must finish in O(log n) — 12 is ample
    edges = [(i, i + 1) for i in range(59)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["id"]: r["label"]
        for r in connected_components(
            df, algorithm="star", max_iter=12, local_threshold=0
        ).collect()
    }
    assert got == {i: 0 for i in range(60)}


def test_star_components_self_loop_and_isolated_vertex(spark):
    edges = spark.createDataFrame([(5, 5), (1, 2)], ["src", "dst"])
    verts = spark.createDataFrame([(9,), (5,), (1,), (2,)], ["id"])
    got = {
        r["id"]: r["label"]
        for r in connected_components(
            edges, vertices=verts, algorithm="star"
        ).collect()
    }
    assert got == {9: 9, 5: 5, 1: 1, 2: 1}


# ------------------------------------------------------------------ quantization
def test_quantize_embeddings_bounds_and_zero_vector(spark):
    from klinker_spark.functions.vectors import quantize_embeddings

    emb = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector: scale 0, all codes 0
            (3, [127.0, -127.0, 1.0, -1.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r.asDict() for r in quantize_embeddings(emb).collect()}
    # reconstruction error of symmetric int8 is bounded by scale/2
    for vid in (1, 3):
        assert out[vid]["max_abs_err"] <= out[vid]["scale"] / 2 + 1e-9
    # vec 3: scale=1, codes are exact integers → zero error
    assert out[3]["scale"] == 1.0
    assert out[3]["max_abs_err"] == 0.0
    assert out[2]["scale"] == 0.0
    assert out[2]["max_abs_err"] == 0.0
    import hashlib

    assert out[2]["qhash"] == hashlib.md5(b"0,0,0,0").hexdigest()
    assert out[1]["qhash"] == hashlib.md5(b"64,-127,32,0").hexdigest()


# ------------------------------------------------------------------ vocab / rollup
def test_vocab_coverage_model(spark):
    from klinker_spark.ops.curation import vocab_coverage

    # vocab_size=2 → vocab = {a, b} (a:4, b:3); c and d are OOV
    docs = _docs(spark, [(1, "a a b c"), (2, "a b d d"), (3, "a b")])
    out = {r["doc_id"]: r.asDict() for r in vocab_coverage(docs, vocab_size=2).collect()}
    assert out[1]["n_oov"] == 1 and out[1]["n_tokens"] == 4
    assert out[2]["n_oov"] == 2 and out[2]["oov_rate"] == 0.5
    assert out[3]["n_oov"] == 0 and out[3]["oov_rate"] == 0.0


def test_corpus_rollup_fertility(spark):
    from klinker_spark.ops.curation import corpus_rollup

    docs = spark.createDataFrame(
        [
            (1, "hello, world!", "s1", "en"),   # ws 2, bpe 4
            (2, "plain words", "s1", "en"),     # ws 2, bpe 2
            (3, "x 1.5", "s2", "de"),           # ws 2, bpe 4
        ],
        ["doc_id", "text", "source", "lang"],
    )
    out = {(r["source"], r["lang"]): r.asDict() for r in corpus_rollup(docs).collect()}
    assert out[("s1", "en")]["n_docs"] == 2
    assert out[("s1", "en")]["n_ws_tokens"] == 4
    assert out[("s1", "en")]["n_bpe_tokens"] == 6
    assert out[("s1", "en")]["fertility"] == 1.5
    assert out[("s2", "de")]["n_bpe_tokens"] == 4  # x, 1, ., 5


# ------------------------------------------------------------------ quality model
def test_quality_classifier_separates_obvious_corpora(spark):
    from klinker_spark.ops.quality_model import train_quality_scores

    rng = random.Random(7)
    good_words = ["science", "history", "theorem", "literature", "analysis"]
    junk_words = ["zzz", "spamspam", "clickbait", "xxxx", "garbage"]
    rows = []
    for i in range(40):
        w = good_words if i % 2 == 0 else junk_words
        text = " ".join(rng.choice(w) for _ in range(12))
        rows.append((i, text, i % 2 == 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "trusted"])
    out = {r["doc_id"]: r["prob"] for r in train_quality_scores(docs, F.col("trusted")).collect()}
    assert len(out) == 40
    good = [out[i] for i in range(0, 40, 2)]
    junk = [out[i] for i in range(1, 40, 2)]
    assert min(good) > max(junk)  # perfectly separable vocabularies
    assert min(good) > 0.9 and max(junk) < 0.1


def test_quality_classifier_deterministic_twin(spark):
    """The exact-oracle twin separates the same corpora (weaker margin
    — 4 GD steps, 8 hash buckets), is deterministic across calls, and
    keeps probabilities in (0, 1)."""
    from klinker_spark.ops.quality_model import train_quality_scores_deterministic

    rng = random.Random(7)
    good_words = ["science", "history", "theorem", "literature", "analysis"]
    junk_words = ["zzz", "spamspam", "clickbait", "xxxx", "garbage"]
    rows = []
    for i in range(40):
        w = good_words if i % 2 == 0 else junk_words
        text = " ".join(rng.choice(w) for _ in range(12))
        rows.append((i, text, i % 2 == 0))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "trusted"])

    def run():
        return {
            r["doc_id"]: r["prob"]
            for r in train_quality_scores_deterministic(
                docs, F.col("trusted"), n_train=40
            ).collect()
        }

    out = run()
    assert len(out) == 40 and all(0.0 < p < 1.0 for p in out.values())
    good = [out[i] for i in range(0, 40, 2)]
    junk = [out[i] for i in range(1, 40, 2)]
    assert min(good) > max(junk)  # separable even with 4 steps
    assert out == run()  # bit-deterministic across invocations


# ------------------------------------------------------------------ empty-corpus sweep
def test_curation_ops_handle_empty_corpus(spark):
    """Every curation operator must return an empty (or
    degenerate-but-valid) result on an empty corpus, never crash —
    pipelines hit empty partitions/slices constantly."""
    from klinker_spark.ops.curation import (
        contamination_check,
        corpus_rollup,
        pack_sequences,
        pii_scrub,
        repetition_stats,
        stratified_sample,
        unigram_logprob_quality,
        vocab_coverage,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    assert repetition_stats(empty).count() == 0
    assert pii_scrub(empty).count() == 0
    assert unigram_logprob_quality(empty).count() == 0
    assert vocab_coverage(empty).count() == 0
    assert pack_sequences(empty, budget=16).count() == 0
    assert stratified_sample(empty, ["lang"], 2).count() == 0
    assert corpus_rollup(empty).count() == 0
    assert contamination_check(empty, F.col("source") == "x").count() == 0

    from klinker_spark.encoders.hashing import topk_pc_power
    from klinker_spark.ops.curation import canonical_dedup
    from klinker_spark.ops.rollup import grouped_quantiles

    assert grouped_quantiles(empty, ["source"], "doc_id").count() == 0
    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    docs3 = spark.createDataFrame([(1, 2.0), (2, 1.0)], ["doc_id", "q"])
    out = {
        r["doc_id"]: r["canonical_id"]
        for r in canonical_dedup(docs3, empty_pairs, priority_col="q").collect()
    }
    assert out == {1: 1, 2: 2}  # no pairs → everyone canonical
    empty_emb = spark.createDataFrame([], "id long, vector array<double>")
    assert topk_pc_power(empty_emb, k=2, sample_n=10, iters=3) == []


def test_canonical_dedup_no_pairs(spark):
    from klinker_spark.ops.curation import canonical_dedup

    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {r["doc_id"]: r["canonical_id"] for r in canonical_dedup(docs, pairs).collect()}
    assert out == {1: 1, 2: 2}


# ------------------------------------------------------------------ end-to-end pipeline
def test_curate_corpus_end_to_end(spark, tmp_path):
    """The full curation composition (quality gate → PII scrub → dedup
    → decontaminate → pack → partitioned shards) on sf0.001: survivor
    counts shrink monotonically, the shards read back with intact
    packing invariants, and a re-run is byte-deterministic."""
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.curate_corpus import curate

    out = str(tmp_path / "shards")
    stats = curate(spark, "/root/testdata/sf0.001", out, budget=128)
    assert (
        stats["input"]
        >= stats["after_quality"]
        >= stats["after_dedup"]
        >= stats["after_decontamination"]
        == stats["packed"]
        > 0
    )
    back = spark.read.parquet(out)
    assert back.count() == stats["packed"]
    # packing invariant survives the round-trip: offsets are a prefix
    # sum within each group when ordered by (start_offset)
    rows = back.select("pack_group", "start_offset", "text").collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["pack_group"], []).append(
            (r["start_offset"], len(r["text"].split(" ")))
        )
    for g, entries in by_group.items():
        entries.sort()
        run = 0
        for off, n in entries:
            assert off == run, f"group {g}: offset {off} != prefix sum {run}"
            run += n


def test_duplicated_span_stats(spark):
    from klinker_spark.ops.curation import duplicated_span_stats

    shared = "one two three four five six seven eight nine ten"
    docs = _docs(
        spark,
        [
            (1, shared + " uniqueafter extra words here now"),
            (2, "prefix words go here " + shared),
            (3, "totally different content with no overlap at all whatsoever"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in duplicated_span_stats(docs, span_k=10).collect()}
    # docs 1 and 2 share exactly the 10-token span `shared`
    assert out[1]["n_dup_spans"] == 1 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_span_frac"] == 0.0
    assert 0 < out[1]["dup_span_frac"] < 1


def test_token_budget_mix_model(spark):
    import hashlib

    from klinker_spark.ops.curation import token_budget_mix

    rows = [(i, " ".join(["w"] * (4 + i % 5)), f"s{i % 2}") for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    budgets = {"s0": 25, "s1": 10}
    out = token_budget_mix(docs, budgets).collect()
    # python model: md5 order per source, cumulative fill
    expect = set()
    for src, budget in budgets.items():
        stream = sorted(
            (r for r in rows if r[2] == src),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        run = 0
        for did, text, _ in stream:
            if run < budget:
                expect.add(did)
            run += len(text.split(" "))
    assert {r["doc_id"] for r in out} == expect
    # the budget-crossing doc is included: each source exceeds or meets
    # its budget with its final doc
    for src, budget in budgets.items():
        total = sum(r["n_tokens"] for r in out if r["source"] == src)
        assert total >= min(
            budget, sum(len(t.split(" ")) for _, t, s in rows if s == src)
        )
    # unknown sources are dropped entirely
    docs2 = spark.createDataFrame([(99, "a b c", "other")], ["doc_id", "text", "source"])
    assert token_budget_mix(docs2, budgets).count() == 0


def test_canonical_dedup_is_idempotent(spark):
    """Fixpoint invariant: every above-threshold pair puts both docs in
    one component, so after keeping only canonical survivors a second
    dedup pass finds ZERO pairs — the corpus is actually clean."""
    from klinker_spark.ops.curation import canonical_dedup
    from klinker_spark.ops.dedup import ngram_jaccard_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = ngram_jaccard_dedup(docs, shingle_k=3, threshold=0.4).select("doc_a", "doc_b")
    assert pairs.count() > 0  # the fixture corpus has planted near-dups
    canon = canonical_dedup(docs, pairs)
    survivors = docs.join(
        canon.where(F.col("is_duplicate") == 0).select("doc_id"), "doc_id", "left_semi"
    )
    again = ngram_jaccard_dedup(survivors, shingle_k=3, threshold=0.4)
    assert again.count() == 0


# ------------------------------------------------------------------ line dedup
def test_line_dedup_removes_corpus_wide_dup_lines(spark):
    from klinker_spark.ops.curation import line_dedup

    boiler = "x1 x2 x3"
    docs = _docs(
        spark,
        [
            (1, f"{boiler} u1 u2 u3"),   # lines: boiler | u1 u2 u3
            (2, f"{boiler} v1 v2 v3"),   # lines: boiler | v1 v2 v3
            (3, "w1 w2 w3"),             # unique single line
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, tokens_per_line=3).collect()
    }
    assert out[1]["text_clean"] == "u1 u2 u3" and out[1]["n_lines_kept"] == 1
    assert out[2]["text_clean"] == "v1 v2 v3"
    assert out[3]["text_clean"] == "w1 w2 w3" and out[3]["n_lines_kept"] == 1
    assert all(out[d]["n_lines"] == (2 if d < 3 else 1) for d in (1, 2, 3))


def test_line_dedup_order_and_within_doc_repeats(spark):
    from klinker_spark.ops.curation import line_dedup

    # the repeated line occurs twice WITHIN one doc -> still banned
    docs = _docs(spark, [(1, "r1 r2 a1 a2 r1 r2 b1 b2")])
    out = line_dedup(docs, tokens_per_line=2).collect()[0]
    assert out["text_clean"] == "a1 a2 b1 b2"  # order of survivors preserved
    assert out["n_lines"] == 4 and out["n_lines_kept"] == 2
    # raising the allowance keeps them
    out2 = line_dedup(docs, tokens_per_line=2, max_occurrences=2).collect()[0]
    assert out2["n_lines_kept"] == 4


def test_line_dedup_empty_and_all_banned_docs_keep_rows(spark):
    from klinker_spark.ops.curation import line_dedup

    docs = _docs(spark, [(1, "d d d"), (2, "d d d"), (3, "")])
    out = {r["doc_id"]: r for r in line_dedup(docs, tokens_per_line=3).collect()}
    assert out[1]["text_clean"] == "" and out[1]["n_lines_kept"] == 0
    assert out[2]["text_clean"] == ""
    assert out[3]["n_lines"] == 0 and out[3]["text_clean"] == ""


def test_line_dedup_split_re_mode(spark):
    from klinker_spark.ops.curation import line_dedup

    docs = _docs(spark, [(1, "dup line\nunique one"), (2, "dup line\nother text")])
    out = {
        r["doc_id"]: r
        for r in line_dedup(docs, line_split_re="\n").collect()
    }
    assert out[1]["text_clean"] == "unique one"
    assert out[2]["text_clean"] == "other text"
    assert out[1]["n_lines"] == 2 and out[1]["n_lines_kept"] == 1


def test_line_dedup_rejoins_with_original_delimiter(spark):
    """Round-3 advisory: a plain-delimiter split ("\\n") must rejoin
    survivors with that delimiter, preserving multi-line structure; a
    regex split with metacharacters falls back to a space unless
    join_sep is explicit."""
    from klinker_spark.ops.curation import line_dedup

    docs = _docs(
        spark,
        [(1, "dup line\nkeep a\nkeep b"), (2, "dup line\nother text")],
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, line_split_re="\n").collect()}
    assert out[1]["text_clean"] == "keep a\nkeep b"  # newline preserved
    regex = {
        r["doc_id"]: r
        for r in line_dedup(docs, line_split_re="\\r?\\n").collect()
    }
    assert regex[1]["text_clean"] == "keep a keep b"  # metachar split -> space
    explicit = {
        r["doc_id"]: r
        for r in line_dedup(docs, line_split_re="\\r?\\n", join_sep="\n").collect()
    }
    assert explicit[1]["text_clean"] == "keep a\nkeep b"


# ------------------------------------------------------------------ gopher rules
def test_gopher_rules_each_rule_and_keep(spark):
    from klinker_spark.ops.curation import gopher_rules

    good = "the " + " ".join(f"tok{i:02d}" for i in range(60))
    docs = _docs(
        spark,
        [
            (1, good),                               # passes everything
            (2, "the short doc"),                    # fails word count
            (3, "the " + " ".join(["x"] * 70)),      # mean word len < 3
            (4, good + " ###### ###### ######"),     # symbol ratio > 0.1 is hard
            (5, "the " + " ".join(["1234"] * 70)),   # alpha ratio fails
            (6, " ".join(f"tok{i:02d}" for i in range(60))),  # no stop word
            (7, None),                               # NULL text
            (8, ""),                                 # empty text
        ],
    )
    out = {
        r["doc_id"]: r
        for r in gopher_rules(docs, min_stop_hits=1).collect()
    }
    assert out[1]["keep"] == 1 and all(
        out[1][f] == 1
        for f in ("pass_word_count", "pass_mean_len", "pass_symbol", "pass_alpha", "pass_stopwords")
    )
    assert out[2]["pass_word_count"] == 0 and out[2]["keep"] == 0
    assert out[3]["pass_mean_len"] == 0 and out[3]["keep"] == 0
    assert out[5]["pass_alpha"] == 0 and out[5]["keep"] == 0
    assert out[6]["pass_stopwords"] == 0 and out[6]["keep"] == 0
    assert out[7]["keep"] == 0 and out[7]["n_words"] is None
    assert out[8]["keep"] == 0 and out[8]["n_words"] == 0


def test_gopher_symbol_rule(spark):
    from klinker_spark.ops.curation import gopher_rules

    # 10 words, 2 symbol occurrences (one '...' + one '#') -> ratio 0.2
    docs = _docs(spark, [(1, "the a b c d e f g h... i#j")])
    out = gopher_rules(docs, min_words=1, min_stop_hits=1).collect()[0]
    assert out["symbol_ratio"] == 0.2
    assert out["pass_symbol"] == 0 and out["keep"] == 0


def test_gopher_rules_distinct_stop_hits(spark):
    from klinker_spark.ops.curation import gopher_rules

    # 'the' used 5x is ONE distinct hit; 'the'+'of' is two
    docs = _docs(spark, [(1, "the the the the the x"), (2, "the of x y")])
    out = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert out[1]["stop_hits"] == 1 and out[1]["pass_stopwords"] == 0
    assert out[2]["stop_hits"] == 2 and out[2]["pass_stopwords"] == 1


# ------------------------------------------------------------------ semdedup
def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semdedup_keeps_lowest_id_per_near_dup_set(spark):
    from klinker_spark.ops.dedup import semdedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.01]),   # near-dup of 1
        (3, [0.0, 1.0]),      # orthogonal: kept
        (4, [0.01, 0.999]),   # near-dup of 3
    ]
    out = {
        r["vec_id"]: r
        for r in semdedup(_emb(spark, rows), n_centroids=1, threshold=0.95).collect()
    }
    assert out[1]["keep"] and out[1]["max_sim_lower"] is None
    assert not out[2]["keep"] and out[2]["max_sim_lower"] >= 0.95
    assert out[3]["keep"]   # best lower-id sim is ~0 < threshold
    assert not out[4]["keep"]


def test_semdedup_threshold_extremes(spark):
    from klinker_spark.ops.dedup import semdedup

    rows = [(i, [float(i + 1), float(2 * i + 1)]) for i in range(6)]
    emb = _emb(spark, rows)
    # threshold > 1: nothing can be dropped
    assert all(r["keep"] for r in semdedup(emb, n_centroids=2, threshold=1.01).collect())
    # threshold -1: only each cluster's lowest id survives
    out = semdedup(emb, n_centroids=2, threshold=-1.0).collect()
    kept = [r for r in out if r["keep"]]
    clusters = {r["cluster_id"] for r in out}
    assert len(kept) == len(clusters)
    for k in kept:
        assert k["vec_id"] == min(
            r["vec_id"] for r in out if r["cluster_id"] == k["cluster_id"]
        )


def test_semdedup_zero_norm_vector_is_null_not_nan(spark):
    from klinker_spark.ops.dedup import semdedup

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])]
    out = {
        r["vec_id"]: r
        for r in semdedup(_emb(spark, rows), n_centroids=1, threshold=0.9).collect()
    }
    # the zero vector's sims are NULL -> it is kept, not NaN-ranked
    assert out[2]["keep"] and out[2]["max_sim_lower"] is None
    # and it never pollutes a real vector's max
    assert not out[3]["keep"] and abs(out[3]["max_sim_lower"] - 1.0) < 1e-6


def test_semdedup_giant_cluster_guard_routes_to_expr(spark):
    """Adversarial single-cluster corpus (n_centroids=1 → EVERY vector
    lands in one cluster): with ``max_cluster_size`` below the corpus
    size, the matmul impl must not hand the whole cluster to one
    applyInPandas task — the oversized cluster runs through the AQE-
    splittable expr join and the results stay bit-identical to the
    unguarded run."""
    from klinker_spark.ops.dedup import semdedup

    import math

    spark.catalog.clearCache()  # other tests share the session
    rows = [
        (i, [math.cos(i / 50.0), math.sin(i / 50.0)]) for i in range(120)
    ]
    emb = _emb(spark, rows)
    guarded = {
        r["vec_id"]: (r["cluster_id"], r["max_sim_lower"], r["keep"])
        for r in semdedup(
            emb, n_centroids=1, threshold=0.999, max_cluster_size=10
        ).collect()
    }
    unguarded = {
        r["vec_id"]: (r["cluster_id"], r["max_sim_lower"], r["keep"])
        for r in semdedup(
            emb, n_centroids=1, threshold=0.999, max_cluster_size=None
        ).collect()
    }
    assert guarded == unguarded
    assert len(guarded) == 120 and any(not v[2] for v in guarded.values())
    # and the guard leaves no persisted DataFrames behind
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_semdedup_empty_corpus(spark):
    from klinker_spark.ops.dedup import semdedup

    emb = _emb(spark, [(1, [1.0, 0.0])]).where(F.lit(False))
    out = semdedup(emb, threshold=0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["vec_id", "cluster_id", "max_sim_lower", "keep"]


def test_semdedup_impl_parity(spark):
    """matmul (BLAS tiles) and expr (Catalyst join) agree bit-for-bit
    at the 6dp output rounding, including NULL patterns."""
    import random

    from klinker_spark.ops.dedup import semdedup

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    rows.append((60, [0.0] * 8))          # zero-norm
    rows.append((61, list(rows[5][1])))   # exact duplicate of id 5
    emb = _emb(spark, rows)
    key = lambda impl: sorted(
        map(tuple, semdedup(emb, n_centroids=4, threshold=0.9, impl=impl).collect())
    )
    assert key("matmul") == key("expr")


def test_load_text_corpus_line_and_wholefile_modes(spark, tmp_path):
    from klinker_spark.data.io import load_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc line\nsecond doc line\n")
    (d / "b.txt").write_text("only line of b\n")

    lines = load_text_corpus(spark, str(d)).collect()
    assert sorted(r["text"] for r in lines) == [
        "first doc line", "only line of b", "second doc line",
    ]
    assert len({r["doc_id"] for r in lines}) == 3  # ids unique
    assert all(r["source"].endswith((".txt",)) for r in lines)
    # deterministic across re-reads
    again = load_text_corpus(spark, str(d)).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in lines}

    whole = load_text_corpus(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    texts = {r["doc_id"].rsplit("/", 1)[-1]: r["text"] for r in whole}
    assert texts["a.txt"] == "first doc line\nsecond doc line\n".rstrip("\n") or \
        "first doc line" in texts["a.txt"]
    # whole-file mode feeds line_dedup's regex mode directly
    from klinker_spark.ops.curation import line_dedup
    ld = line_dedup(
        load_text_corpus(spark, str(d), whole_files=True), line_split_re="\n"
    )
    assert ld.count() == 2


def test_bigram_logprob_against_model(spark):
    import math

    from klinker_spark.ops.curation import bigram_logprob_quality

    rows = [(1, "a b a b"), (2, "b a c"), (3, "c c")]
    docs = _docs(spark, rows)
    lam = 0.7
    toks = [t for _, txt in rows for t in txt.split(" ")]
    n = len(toks)
    uni = {t: toks.count(t) for t in set(toks)}
    bigs = [
        (ts[i - 1], ts[i])
        for _, txt in rows
        for ts in [txt.split(" ")]
        for i in range(1, len(ts))
    ]
    cab = {p: bigs.count(p) for p in set(bigs)}
    ca = {}
    for (a, _), c in cab.items():
        ca[a] = ca.get(a, 0) + c

    def lp(a, b):
        pu = uni[b] / n
        if a is None:
            return _micro(math.log(pu))
        pb = cab.get((a, b), 0) / ca[a] if (a, b) in cab else 0.0
        return _micro(math.log(lam * pb + (1.0 - lam) * pu))

    expect = {}
    for d, txt in rows:
        ts = txt.split(" ")
        s = lp(None, ts[0]) + sum(lp(ts[i - 1], ts[i]) for i in range(1, len(ts)))
        expect[d] = _r(s / (1e6 * len(ts)), 6)
    got = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_quality(docs).collect()}
    assert got == expect


def test_bigram_logprob_sees_word_order(spark):
    """The point of the bigram term: a scrambled doc scores LOWER than
    a doc whose bigrams match the corpus — unigram scoring can't tell
    them apart."""
    from klinker_spark.ops.curation import bigram_logprob_quality, unigram_logprob_quality

    rows = [(i, "the quick brown fox jumps high") for i in range(10)]
    rows.append((100, "the quick brown fox jumps high"))   # natural order
    rows.append((101, "fox the jumps brown high quick"))   # same bag of words
    docs = _docs(spark, rows)
    bg = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_quality(docs).collect()}
    ug = {r["doc_id"]: r["avg_logprob"] for r in unigram_logprob_quality(docs).collect()}
    assert ug[100] == ug[101]          # unigram blind to order
    assert bg[100] > bg[101]           # bigram not


def test_bigram_logprob_single_token_doc_uses_unigram(spark):
    from klinker_spark.ops.curation import bigram_logprob_quality, unigram_logprob_quality

    docs = _docs(spark, [(1, "solo"), (2, "solo pair")])
    bg = {r["doc_id"]: r for r in bigram_logprob_quality(docs).collect()}
    ug = {r["doc_id"]: r for r in unigram_logprob_quality(docs).collect()}
    assert bg[1]["n_tokens"] == 1
    assert bg[1]["avg_logprob"] == ug[1]["avg_logprob"]


def test_curate_corpus_optional_stages(spark, tmp_path):
    """The CLI composition with every optional stage on: normalize →
    line-dedup → (repetition ∧ LM ∧ gopher) → PII → dedup → decontam →
    pack; stage counts monotonically decrease and shards land."""
    from scripts.curate_corpus import curate

    out = str(tmp_path / "shards_opt")
    stats = curate(
        spark,
        "/root/testdata/sf0.001",
        out,
        budget=128,
        min_logprob=-20.0,
        normalize=True,
        gopher=True,
        line_dedup_max_occ=2,
        span_dedup_k=10,
    )
    assert stats["input"] == 500
    assert 0 < stats["after_line_dedup"] <= stats["input"]
    assert 0 < stats["after_quality"] <= stats["after_line_dedup"]
    assert 0 < stats["after_dedup"] <= stats["after_quality"]
    assert 0 < stats["after_span_dedup"] <= stats["after_dedup"]
    assert stats["packed"] > 0 and stats["bins"] > 0
    got = spark.read.parquet(out)
    assert got.count() == stats["packed"]


def test_semdedup_malformed_vectors_kept_not_crashed(spark):
    """NULL / empty / dimension-mismatched vectors are excluded from
    clustering (keep=true, unclustered) instead of crashing the BLAS
    kernel or the fit — both quantizers."""
    from klinker_spark.ops.dedup import semdedup

    rows = [
        (1, [1.0, 0.0]),
        (2, None),
        (3, [0.99, 0.01]),
        (4, []),
        (5, [1.0, 2.0, 3.0]),   # ragged dim
        (6, [-1.0, 0.0]),       # far point: gives kmeans k=2 a second cluster
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for quant, k in (("hash_sample", 1), ("kmeans", 2)):  # MLlib needs k >= 2
        out = {r["vec_id"]: r for r in semdedup(emb, n_centroids=k, threshold=0.9, quantizer=quant).collect()}
        assert set(out) == {1, 2, 3, 4, 5, 6}
        for bad in (2, 4, 5):
            assert out[bad]["keep"] and out[bad]["cluster_id"] is None
        assert not out[3]["keep"]  # real near-dup of 1 still caught


def test_semdedup_oracle_parity_with_malformed_vectors(spark):
    """The registered DuckDB oracle mirrors the engine's malformed-row
    exclusion (NULL / empty / ragged) — checked directly on a frame the
    driver's testdata can't currently produce but a regen might."""
    import duckdb
    import pandas as pd

    from klinker_spark.ops.dedup import semdedup
    from klinker_spark.queries import ORACLES

    rows = [
        (1, [1.0, 0.0]), (2, None), (3, [0.99, 0.01]), (4, []),
        (5, [1.0, 2.0, 3.0]), (6, [-1.0, 0.2]), (7, [0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r["vec_id"], r["cluster_id"], r["max_sim_lower"], r["keep"])
        for r in semdedup(emb, n_centroids=16, threshold=0.35).collect()
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    con.register("embeddings", pdf)
    want = sorted(
        (int(a), None if b is None else int(b), c, bool(d))
        for a, b, c, d in con.execute(ORACLES["semdedup"]).fetchall()
    )
    assert got == want


def test_chunk_documents_windows(spark):
    """Window arithmetic: stride = size − overlap, last chunk short,
    every chunk introduces ≥ 1 new token, empty docs vanish."""
    import pytest as _pytest

    from klinker_spark.ops.curation import chunk_documents

    text = " ".join(str(i) for i in range(10))  # tokens 0..9
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, ""), (4, None)], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_size=4, overlap=1)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in out.collect()
    }
    # doc 1: stride 3 → starts 0,3,6,9 → windows of ≤4
    assert rows[(1, 0)] == (4, "0 1 2 3")
    assert rows[(1, 1)] == (4, "3 4 5 6")
    assert rows[(1, 2)] == (4, "6 7 8 9")
    assert rows[(1, 3)] == (1, "9")
    assert rows[(2, 0)] == (2, "a b")
    assert {k[0] for k in rows} == {1, 2}  # empty/null docs: no chunks
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_size=4, overlap=4)
    with _pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(docs, chunk_size=0)


def test_weighted_sample_matches_reference_impl(spark):
    # A-ES against a NumPy-free Python reference with the identical
    # md5-uniform derivation
    import hashlib, math

    rows = [(i, (i % 7) + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    from klinker_spark.ops.curation import weighted_sample

    got = [(r.doc_id, r.rank) for r in weighted_sample(df, "w", k=5).collect()]

    def key(i, w):
        u_int = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        u = (u_int + 0.5) / float(1 << 48)
        return round(-math.log(u) / w * 1e6)

    exp = sorted(((key(i, w), i) for i, w in rows))[:5]
    assert got == [(i, r + 1) for r, (_, i) in enumerate(exp)]


def test_weighted_sample_zero_weight_excluded_and_bias(spark):
    from klinker_spark.ops.curation import weighted_sample

    rows = [(i, 1000 if i < 10 else 1) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, "w", k=10).collect()
    ids = {r.doc_id for r in out}
    assert 999 not in ids
    # heavy rows (1000x weight) should dominate the sample
    assert len([i for i in ids if i < 10]) >= 8
    # ranks are 1..k by ascending key
    ks = [r.es_key for r in sorted(out, key=lambda r: r.rank)]
    assert ks == sorted(ks)


def test_weighted_sample_plan_is_take_ordered(spark):
    from klinker_spark.ops.curation import weighted_sample

    df = spark.createDataFrame([(i, i + 1) for i in range(50)], "doc_id long, w long")
    plan = weighted_sample(df, "w", k=3)._jdf.queryExecution().executedPlan().toString()
    # the global top-k must be TakeOrderedAndProject (per-partition
    # top-k + driver merge), not a single-reducer global Sort
    assert "TakeOrderedAndProject" in plan


def test_remove_duplicated_spans(spark):
    """Hand-built fixture: a shared 3-gram spans two docs; all of its
    occurrences (including an intra-doc repeat) are removed, unique
    text survives, short docs pass through untouched."""
    from klinker_spark.ops.curation import remove_duplicated_spans

    boiler = "all rights reserved"
    rows = [
        (1, f"alpha beta {boiler} gamma"),
        (2, f"{boiler} delta epsilon"),
        (3, f"{boiler} zeta {boiler}"),   # intra-doc repeat
        (4, "tiny doc"),                  # shorter than span_k
        (5, boiler),                      # fully covered -> empty
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(docs, span_k=3, min_df=2).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta epsilon"
    assert out[3]["clean_text"] == "zeta"
    assert out[4]["clean_text"] == "tiny doc" and out[4]["n_after"] == 2
    assert out[5]["clean_text"] == "" and out[5]["n_after"] == 0
    assert out[1]["n_before"] == 6 and out[1]["n_after"] == 3
    # a doc whose every 3-gram is unique is untouched
    u = remove_duplicated_spans(
        spark.createDataFrame([(9, "one two three four")], ["doc_id", "text"]),
        span_k=3,
    ).first()
    assert u["clean_text"] == "one two three four"


def test_temperature_mix(spark):
    """α-tempered shares vs a Python replication; α<1 boosts the small
    source above its natural share and ppm columns are consistent."""
    import math

    from klinker_spark.ops.curation import temperature_mix

    rows = [(i, "w " * 99 + "w", "big") for i in range(20)] + [
        (100 + i, "w w w w w w w w w w", "small") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r.asDict() for r in temperature_mix(docs, alpha=0.3).collect()}
    c = {"big": 2000, "small": 30}
    tot = sum(c.values())
    z = sum(math.exp(0.3 * math.log(c[s])) for s in sorted(c))
    for s in c:
        assert out[s]["n_tokens"] == c[s]
        assert out[s]["share_ppm"] == round(c[s] * 1e6 / tot)
        assert out[s]["p_temp_ppm"] == round(
            math.exp(0.3 * math.log(c[s])) * 1e6 / z
        )
    # small source up-weighted, big down-weighted
    assert out["small"]["boost_ppm"] > 1_000_000 > out["big"]["boost_ppm"]


def test_weighted_stratified_sample(spark):
    """Quota per stratum, A-ES key parity with the global sampler, and
    determinism across runs."""
    from klinker_spark.ops.curation import weighted_sample, weighted_stratified_sample

    rows = [(i, ["s0", "s1"][i % 2], 10 + i) for i in range(40)] + [(99, "s2", 0)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = weighted_stratified_sample(docs, ["source"], "n_chars", 3).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
    assert set(per) == {"s0", "s1"}  # zero-weight stratum s2 excluded
    for src, rs in per.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3]
    # within one stratum the selection equals the global sampler run
    # on just that stratum (same keys, same order)
    solo = weighted_sample(docs.where(F.col("source") == "s0"), "n_chars", k=3).collect()
    assert [(r["doc_id"], r["es_key"]) for r in sorted(per["s0"], key=lambda r: r["rank"])] == [
        (r["doc_id"], r["es_key"]) for r in sorted(solo, key=lambda r: r["rank"])
    ]
    again = weighted_stratified_sample(docs, ["source"], "n_chars", 3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
