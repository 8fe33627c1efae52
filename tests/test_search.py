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


def test_coverage_ranker_orders_by_terms_then_brevity(corpus):
    from klinker_spark.ops.search import coverage_topk

    res = sorted(
        coverage_topk(corpus, [(0, "spark join")], k=10).collect(),
        key=lambda r: r.rank,
    )
    # doc 1 has both terms; docs 2 (spark) and 4 (join) one term each,
    # doc 4 is shorter -> ranks: 1, 4, 2
    assert [r.doc_id for r in res] == [1, 4, 2]


def test_rrf_fusion_hand_computed(corpus):
    from klinker_spark.ops.search import bm25_topk, coverage_topk, rrf_fuse

    bm = bm25_topk(corpus, [(0, "spark join")], k=10)
    cov = coverage_topk(corpus, [(0, "spark join")], k=10)
    bm_r = {r.doc_id: r.rank for r in bm.collect()}
    cov_r = {r.doc_id: r.rank for r in cov.collect()}
    got = {r.doc_id: (r.n_rankers, r.score) for r in rrf_fuse([bm, cov], k=10).collect()}
    for d in set(bm_r) | set(cov_r):
        sn = sum(
            round(1e9 / (60 + rk[d])) for rk in (bm_r, cov_r) if d in rk
        )
        assert got[d][0] == (d in bm_r) + (d in cov_r)
        assert got[d][1] == pytest.approx(round(sn / 1e9, 6), abs=1e-12)


def test_rrf_doc_in_both_rankers_beats_single(corpus):
    from klinker_spark.ops.search import rrf_fuse

    a = corpus.sparkSession.createDataFrame(
        [(0, 1, 1), (0, 2, 2)], "query_id long, doc_id long, rank int"
    )
    b = corpus.sparkSession.createDataFrame(
        [(0, 2, 1), (0, 3, 2)], "query_id long, doc_id long, rank int"
    )
    res = sorted(rrf_fuse([a, b], k=10).collect(), key=lambda r: r.rank)
    # doc 2 appears in both -> top even though never rank 1 alone... it
    # is rank 2+1: 1/62+1/61 > 1/61 (doc1) -> doc 2 first
    assert res[0].doc_id == 2 and res[0].n_rankers == 2
