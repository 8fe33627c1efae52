"""Property-based tests (hypothesis): the codegen text functions agree
with straightforward pure-Python models on arbitrary inputs.

These pin the exact engine semantics the DuckDB oracles assume —
tokenize's split/filter/dedup order, qgram windows, shingle edges."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from klinker_spark.functions.text import STOPWORDS, qgrams, tokenize, word_shingles

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=["Ll", "Lu", "Nd", "Zs", "Po"]),
    max_size=60,
)


def py_tokenize(s, min_len=3, stopwords=STOPWORDS):
    toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if len(t) >= min_len]
    if stopwords:
        # array_except semantics: dedup, keep first-seen order
        seen, out = set(), []
        for t in toks:
            if t not in stopwords and t not in seen:
                seen.add(t)
                out.append(t)
        return out
    return toks


def py_qgrams(s, q=3):
    if s is None:
        return None
    return [s[i : i + q] for i in range(len(s) - q + 1)]


def py_shingles(toks, k=3, sep=" "):
    if not toks:
        return []  # zero-token docs produce NO shingles (no '' pairing)
    if len(toks) <= k:
        return [sep.join(toks)]
    return [sep.join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


@pytest.fixture(scope="module")
def run_expr(spark):
    def _run(value, expr):
        df = spark.createDataFrame([(value,)], "s string")
        return df.select(expr.alias("out")).first()["out"]

    return _run


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=TEXT)
def test_tokenize_matches_python(run_expr, s):
    assert run_expr(s, tokenize("s")) == py_tokenize(s)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=TEXT)
def test_qgrams_match_python(run_expr, s):
    assert run_expr(s, qgrams("s", 3)) == py_qgrams(s, 3)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=TEXT)
def test_shingles_match_python(run_expr, s):
    got = run_expr(s, word_shingles(tokenize("s", 1, []), 3))
    toks = py_tokenize(s, min_len=1, stopwords=[])
    assert got == py_shingles(toks, 3)


def test_qgrams_null_and_short(run_expr):
    assert run_expr(None, qgrams("s", 3)) is None
    assert run_expr("ab", qgrams("s", 3)) == []


def py_tokenize_keep_dups(s, min_len=3, stopwords=STOPWORDS):
    toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if len(t) >= min_len]
    # per-element stopword filter: occurrences preserved, order kept
    return [t for t in toks if t not in stopwords]


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(s=TEXT)
def test_tokenize_keep_duplicates_matches_python(run_expr, s):
    """keep_duplicates=True preserves token occurrences (the pooling
    semantics KeyedVectorsEncoder weights by) while still dropping
    stopwords — vs the default array_except set semantics."""
    assert run_expr(s, tokenize("s", keep_duplicates=True)) == py_tokenize_keep_dups(s)


VEC = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(v=VEC)
def test_quantize_embeddings_properties(spark, v):
    """Int8 quantization invariants on arbitrary float32 vectors: codes
    bounded by ±127 (implied by err bound), reconstruction error ≤
    scale/2 (+ rounding slack), zero vectors degenerate cleanly."""
    from klinker_spark.functions.vectors import quantize_embeddings

    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<float>")
    r = quantize_embeddings(df).first()
    import numpy as np

    amax = float(np.abs(np.array(v, dtype=np.float64)).max())
    if amax == 0.0:
        assert r["scale"] == 0.0 and r["max_abs_err"] == 0.0
    else:
        scale = amax / 127
        # 6dp output rounding adds at most 5e-7 slack on each side
        assert r["max_abs_err"] <= scale / 2 + 1e-6
        assert abs(r["scale"] - round(scale, 6)) <= 1e-9


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_line_dedup_reassembly_invariants(spark, texts):
    """line_dedup invariants on arbitrary docs: kept-line count never
    exceeds the line count, surviving text is a subsequence of the
    original chunking, and raising max_occurrences to the corpus line
    total keeps everything."""
    from klinker_spark.ops.curation import line_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(docs, tokens_per_line=2).collect()}
    total_lines = sum(r["n_lines"] for r in out.values())
    for i, t in rows:
        r = out[i]
        assert 0 <= r["n_lines_kept"] <= r["n_lines"]
        toks = [x for x in t.split(" ") if x]
        assert r["n_lines"] == (len(toks) + 1) // 2
        kept_tokens = [x for x in r["text_clean"].split(" ") if x]
        # surviving tokens are a subsequence of the original tokens
        it = iter(toks)
        assert all(any(x == y for y in it) for x in kept_tokens)
    lax = {
        r["doc_id"]: r
        for r in line_dedup(docs, tokens_per_line=2, max_occurrences=max(total_lines, 1)).collect()
    }
    for i, t in rows:
        assert lax[i]["n_lines_kept"] == lax[i]["n_lines"]


import pytest as _pytest


@_pytest.mark.parametrize("impl", ["deletion", "prefix"])
@given(texts=st.lists(st.text(alphabet="abc", min_size=0, max_size=8), min_size=2, max_size=10))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_edit_distance_join_complete_on_arbitrary_strings(spark, impl, texts):
    """NEITHER candidate filter loses a qualifying pair on arbitrary
    short strings (incl. empties and duplicates).  The prefix impl is
    the adversarial one here: short strings are all gram-deficient
    (≤ d·q distinct 3-grams), exercising the length-banded deficient
    bucket end to end (round-3 advisory: "abcde"/"abxde" share zero
    3-grams yet are Ed=1)."""
    from klinker_spark.ops.dedup import edit_distance_dedup

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in edit_distance_dedup(docs, max_dist=1, impl=impl).collect()
    }
    want = {
        (ia, ib, lev(ta, tb))
        for ia, ta in rows
        for ib, tb in rows
        if ia < ib and lev(ta, tb) <= 1
    }
    assert got == want


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=0, max_value=40),
    chunk_size=st.integers(min_value=1, max_value=10),
    overlap=st.integers(min_value=0, max_value=9),
)
def test_chunk_documents_matches_python_model(spark, n_tokens, chunk_size, overlap):
    """Window arithmetic vs a direct Python model: same chunk count,
    same per-chunk token windows, full coverage, for arbitrary sizes."""
    if overlap >= chunk_size:
        return
    from klinker_spark.ops.curation import chunk_documents

    toks = [f"t{i}" for i in range(n_tokens)]
    docs = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    got = {
        r["chunk_idx"]: (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_size=chunk_size, overlap=overlap).collect()
    }
    stride = chunk_size - overlap
    want = {}
    i = 0
    while i * stride < n_tokens:
        w = toks[i * stride : i * stride + chunk_size]
        want[i] = (len(w), " ".join(w))
        i += 1
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from("abcdefg")),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.sampled_from("abcdefg"), st.integers(0, 9)),
        min_size=0,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_join_equals_plain_join_property(spark, lrows, rrows, n_salt):
    """∀ inputs and salt widths: salted inner/left joins are
    row-multiset-identical to the plain joins."""
    from klinker_spark.ops.profile import salted_join

    left = spark.createDataFrame(lrows or [(0, "zz")][:0], "rid int, k string") \
        if lrows else spark.createDataFrame([], "rid int, k string")
    right = spark.createDataFrame(rrows, "k string, v int") \
        if rrows else spark.createDataFrame([], "k string, v int")
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(left, right, "k", n_salt=n_salt, how=how).collect()))
        want = sorted(map(tuple, left.join(right, "k", how).select("k", "rid", "v").collect()))
        assert got == want


@given(
    st.lists(st.text(alphabet="abcd", min_size=0, max_size=4), min_size=1, max_size=80)
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_rank_is_a_permutation_matching_sort(spark, keys):
    """∀ key multisets: global_rank emits exactly 1..n and agrees with
    the Python sort under the same total order."""
    from klinker_spark.ops.profile import global_rank

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id int, k string").repartition(5)
    got = {r["id"]: r["rank"] for r in global_rank(df, ["k", "id"]).collect()}
    assert sorted(got.values()) == list(range(1, len(rows) + 1))
    want = {i: pos + 1 for pos, (k, i) in enumerate(sorted((k, i) for i, k in rows))}
    assert got == want


@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=120))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_shard_merge_invariant_property(spark, vals):
    """∀ value multisets and 3-way shardings: max-merged shard
    registers equal the single-pass sketch registers."""
    from klinker_spark.ops.sketches import hll_distinct, hll_estimate, hll_registers

    df = spark.createDataFrame([(v, i % 3) for i, v in enumerate(vals)], "tok string, sh int")
    whole = hll_distinct(df, "tok").first()
    parts = [hll_registers(df.where(F.col("sh") == s), "tok") for s in range(3)]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2]) \
        .groupBy("bucket").agg(F.max("mj").cast("int").alias("mj"))
    got = hll_estimate(merged).first()
    assert list(got["registers"]) == list(whole["registers"])
    assert got["estimate"] == whole["estimate"]


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 20)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_intervals_matches_naive_property(spark, spans):
    """∀ interval sets: merged islands equal the classic sweep-line
    union (same key)."""
    from klinker_spark.ops.temporal import merge_intervals

    rows = [("k", s, s + ln) for s, ln in spans]
    if not rows:
        return
    df = spark.createDataFrame(rows, "k STRING, s BIGINT, e BIGINT")
    got = sorted(
        (r["start"], r["end"], r["n_rows"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )
    # naive sweep line
    want = []
    for s, e in sorted((s, e) for _, s, e in rows):
        if want and s <= want[-1][1]:
            want[-1] = (want[-1][0], max(want[-1][1], e), want[-1][2] + 1)
        else:
            want.append((s, e, 1))
    assert got == [tuple(w) for w in want]


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_funnel_matches_naive_simulation_property(spark, evs):
    """∀ single-user event streams: funnel step counts equal a direct
    simulation of the strict (ts, id) ordering."""
    from datetime import datetime, timedelta

    from klinker_spark.ops.behavior import funnel_steps

    if not evs:
        return
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=t), 1, ty, 0.0) for i, (t, ty) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    steps = ["a", "b", "c"]
    got = {r["step"]: r["n_users"] for r in funnel_steps(df, steps).collect()}
    # simulate: first 'a' by (t, id); then first 'b' strictly after; ...
    seq = sorted((t, i, ty) for i, (t, ty) in enumerate(evs))
    reached = 0
    cur = None
    for want_ty in steps:
        nxt = next(
            ((t, i) for t, i, ty in seq if ty == want_ty and (cur is None or (t, i) > cur)),
            None,
        )
        if nxt is None:
            break
        cur = nxt
        reached += 1
    for k, s in enumerate(steps, 1):
        assert got[k] == (1 if reached >= k else 0)
