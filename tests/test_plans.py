"""Physical-plan regression tests — the scale properties SCALE.md
claims must survive refactors: column pruning at the scan, broadcasts
where a side is provably small, no cartesian products in the relational
kernel, codegen (not interpreted) projections."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_token_blocking_prunes_and_broadcasts(spark, sf_dir):
    from klinker_spark.queries import QUERIES

    plan = plan_of(QUERIES["token_blocking"](spark, sf_dir))
    # scan reads only the two needed columns per side
    assert "c_custkey:bigint,c_name:string" in plan.replace(" ", "")
    assert "s_suppkey:bigint,s_name:string" in plan.replace(" ", "")
    # small (supplier) side broadcasts; no shuffle join needed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_knn_broadcasts_index(spark, sf_dir):
    from klinker_spark.queries import QUERIES

    plan = plan_of(QUERIES["knn_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # deliberate broadcast cross join
    assert "PushedFilters: [IsNotNull(vec_id)]" in plan


def test_windowed_counts_partial_aggregation(spark, sf_dir):
    from klinker_spark.queries import QUERIES

    plan = plan_of(QUERIES["windowed_event_counts"](spark, sf_dir))
    # map-side partial + final aggregate around exactly one exchange
    assert plan.count("HashAggregate") >= 2
    assert "ts:bigint,event_type:string,value:double" in plan.replace(" ", "")


def test_importance_filter_broadcasts(spark):
    from klinker_spark.blockers.relation_aware import filter_importance, relation_importance

    rels = spark.createDataFrame(
        [("a", "r1", "b"), ("a", "r2", "c")], "head string, rel string, tail string"
    )
    imp = relation_importance(rels, 3)
    plan = plan_of(filter_importance(rels, imp, 1, "rel", "head"))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_no_python_udfs_in_relational_kernel(spark, sf_dir):
    from klinker_spark.queries import QUERIES

    for name in [
        "token_blocking",
        "relational_token_blocking",
        "ngram_jaccard_dedup",
        "minhash_dedup",
        "quality_score",
    ]:
        plan = plan_of(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
