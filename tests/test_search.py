"""BM25 top-k retrieval (ops/search.py) — hand-computed scores on a
tiny corpus, ranking/tie semantics, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.search import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join join table"),
        (2, "spark table scan"),
        (3, "hash hash hash hash"),
        (4, "join"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, df, dl, n_docs, sum_dl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (float(n_docs) - df + 0.5) / (df + 0.5))
    denom = tf + k1 * (1.0 - b + b * (dl / (sum_dl / float(n_docs))))
    return idf * (tf * (k1 + 1.0)) / denom


def test_bm25_scores_match_hand_computation(corpus):
    out = {
        (r.query_id, r.doc_id): r
        for r in bm25_topk(corpus, [(0, "join")], k=10).collect()
    }
    # corpus stats: doc 5 is empty -> N=4 docs with tokens, sum_dl=12
    # 'join': tf(1)=2, tf(4)=1, df=2
    exp1 = round(round(_bm25(2, 2, 4, 4, 12.0) * 1e6) / 1e6, 6)
    exp4 = round(round(_bm25(1, 2, 1, 4, 12.0) * 1e6) / 1e6, 6)
    assert out[(0, 1)].score == pytest.approx(exp1, abs=1e-9)
    assert out[(0, 4)].score == pytest.approx(exp4, abs=1e-9)
    assert set(out) == {(0, 1), (0, 4)}


def test_bm25_ranking_and_term_count(corpus):
    res = bm25_topk(corpus, [(0, "spark join"), (1, "hash")], k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    # doc 1 matches both terms (tf join=2) -> top; ranks contiguous from 1
    assert [r.doc_id for r in q0][0] == 1
    assert [r.rank for r in q0] == list(range(1, len(q0) + 1))
    assert q0[0].n_terms_matched == 2
    # query 1: only doc 3 contains 'hash'
    assert [(r.doc_id, r.n_terms_matched) for r in by_q[1]] == [(3, 1)]


def test_bm25_rare_term_outscores_common(corpus):
    # 'scan' (df=1) in doc 2 must outscore 'join' (df=2) in doc 4 at
    # comparable tf/dl -> idf ordering is monotone in rarity
    res = {r.doc_id: r.score for r in bm25_topk(corpus, [(0, "scan join")], k=10).collect()}
    assert res[2] > res[4]


def test_bm25_topk_truncates(corpus):
    res = bm25_topk(corpus, [(0, "spark join table scan hash")], k=1).collect()
    assert len(res) == 1 and res[0].rank == 1


def test_bm25_plan_broadcasts_and_no_python_udf(corpus):
    plan = bm25_topk(corpus, [(0, "join scan")], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
