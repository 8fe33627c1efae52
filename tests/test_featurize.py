"""Skip-gram pair generation, winsorization, LOO target encoding —
naive-model parity on hand-built frames."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from klinker_spark.ops.rollup import winsorize
from klinker_spark.ops.textstats import skipgram_pairs, target_encode_loo


def _naive_skipgrams(texts, window):
    c = Counter()
    for t in texts:
        tk = [x for x in t.split(" ") if x]
        for i, center in enumerate(tk):
            for j in range(max(0, i - window), min(len(tk), i + window + 1)):
                if j != i:
                    c[(center, tk[j])] += 1
    return c


def test_skipgram_pairs_matches_naive(spark):
    texts = ["a b c a b", "b c d", "a a a"]
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = {
        (r["center"], r["context"]): r["n"]
        for r in skipgram_pairs(docs, window=2, min_count=1).collect()
    }
    assert got == dict(_naive_skipgrams(texts, 2))


def test_skipgram_min_count_floors(spark):
    docs = spark.createDataFrame([("a b",), ("a b",), ("x y",)], "text STRING")
    got = {(r["center"], r["context"]) for r in skipgram_pairs(docs, 2, min_count=2).collect()}
    assert got == {("a", "b"), ("b", "a")}


def test_winsorize_clips_tails(spark):
    # 16 values 0..15: 1/16 fence = 0.9375, 15/16 fence = 14.0625
    df = spark.createDataFrame(
        [(i, "g", i) for i in range(16)], "id BIGINT, g STRING, v BIGINT"
    )
    rows = {r["id"]: r["clipped"] for r in winsorize(df, ["g"], "v").collect()}
    assert rows[0] == 0.9375  # clipped up, exact dyadic interpolation
    assert rows[15] == 14.0625  # clipped down
    assert rows[7] == 7.0  # interior untouched


def test_target_encode_loo_matches_naive(spark):
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 33), (4, "b", 5), (5, "c", 7)]
    df = spark.createDataFrame(rows, "id BIGINT, cat STRING, t BIGINT")
    got = {r["id"]: r["loo_mean_micro"] for r in target_encode_loo(df, "cat", "t", ["id"]).collect()}
    def loo(vals, x):
        s = sum(vals) - x
        n = len(vals) - 1
        return (2_000_000 * s + n) // (2 * n)
    a = [10, 20, 33]
    assert got[1] == loo(a, 10) == 26_500_000
    assert got[2] == loo(a, 20)
    assert got[4] is None  # singleton category: no peers
    assert got[5] is None


def test_loo_plan_broadcasts_and_single_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "c" + str(i % 3), i) for i in range(30)], "id BIGINT, cat STRING, t BIGINT"
    )
    plan = (
        target_encode_loo(df, "cat", "t", ["id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_jl_projection_matches_naive(spark):
    import hashlib

    from klinker_spark.ops.similarity import jl_project

    vecs = [
        (1, [1.0, 0.0, -1.0, 0.5]),
        (2, [0.25, 0.25, 0.25, 0.25]),
    ]
    df = spark.createDataFrame(vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    got = {
        (r["id"], r["out_dim"]): r["comp_micro"]
        for r in jl_project(df, in_dim=4, out_dim=3).collect()
    }

    def sg(i, j):
        return 1 if int(hashlib.md5(f"0:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1

    for vid, v in vecs:
        for j in range(3):
            want = sum(sg(i, j) * round(x * 1_000_000) for i, x in enumerate(v))
            assert got[(vid, j)] == want


def test_fellegi_sunter_score_hand_computed(spark):
    import math

    from klinker_spark.ops.linkage import fellegi_sunter_score, fs_weights_nano

    w = fs_weights_nano(m=[0.9], u=[0.1])
    assert w[0][0] == round(1e9 * math.log(9.0))
    assert w[0][1] == round(1e9 * math.log(1 / 9))
    pairs = spark.createDataFrame(
        [(1, 10, "abc", "abc"), (2, 20, "abc", "xyz")],
        "left_id BIGINT, right_id BIGINT, lk STRING, rk STRING",
    )
    out = {
        r["left_id"]: (r["a_eq"], r["score_nano"], r["is_match"])
        for r in fellegi_sunter_score(
            pairs, [("a_eq", F.col("lk") == F.col("rk"))], w
        ).collect()
    }
    assert out[1] == (1, w[0][0], True)
    assert out[2] == (0, w[0][1], False)


def test_fs_weights_validate_params(spark):
    import pytest

    from klinker_spark.ops.linkage import fs_weights_nano

    with pytest.raises(ValueError):
        fs_weights_nano(m=[0.5], u=[0.9])  # u must be < m
