"""Behavior-analytics operators (ops/behavior.py) + integer z-score
outliers (ops/profile.py) + CDC chunking (ops/dedup.py): semantics on
hand-built frames, then plan-shape assertions (broadcast stats join,
no cartesian products).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.behavior import (
    event_transitions,
    funnel_steps,
    gap_fill_hourly,
    retention_cohorts,
    top_event_paths,
)
from klinker_spark.ops.dedup import cdc_chunk_stats
from klinker_spark.ops.profile import zscore_outliers

TS = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
EV_SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_funnel_requires_strict_order(spark):
    ev = _ev(
        spark,
        [
            # user 1: view BEFORE signup -> stops at step 1
            (1, TS(3), 1, "view", 0.0),
            (2, TS(5), 1, "signup", 0.0),
            # user 2: full ordered funnel
            (3, TS(1), 2, "signup", 0.0),
            (4, TS(2), 2, "view", 0.0),
            (5, TS(3), 2, "click", 0.0),
            (6, TS(4), 2, "purchase", 0.0),
        ],
    )
    out = {
        r["event_type"]: r
        for r in funnel_steps(ev, ["signup", "view", "click", "purchase"]).collect()
    }
    assert out["signup"]["n_users"] == 2
    assert out["view"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["signup"]["conv_ppm"] == 1_000_000
    assert out["view"]["conv_ppm"] == 500_000


def test_funnel_tie_breaks_on_event_id(spark):
    # signup and view share a timestamp; view's event_id is larger, so
    # (ts, id) ordering admits it — but a view with a SMALLER id at the
    # same ts must not count
    ev = _ev(
        spark,
        [
            (5, TS(1), 1, "signup", 0.0),
            (6, TS(1), 1, "view", 0.0),  # same ts, id 6 > 5 -> counts
            (1, TS(2), 2, "signup", 0.0),
            (0, TS(2), 2, "view", 0.0),  # same ts, id 0 < 1 -> rejected
        ],
    )
    out = {r["event_type"]: r for r in funnel_steps(ev, ["signup", "view"]).collect()}
    assert out["view"]["n_users"] == 1


def test_retention_cohorts_offsets(spark):
    ev = _ev(
        spark,
        [
            # user 1 first touch day 0, active again day 8 (offset week 1)
            (1, datetime(2024, 1, 1), 1, "view", 0.0),
            (2, datetime(2024, 1, 9), 1, "view", 0.0),
            # user 2 first touch day 8 (cohort week 1)
            (3, datetime(2024, 1, 9), 2, "view", 0.0),
        ],
    )
    rows = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert rows == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_event_transitions_counts_and_ppm(spark):
    ev = _ev(
        spark,
        [
            (1, TS(1), 1, "a", 0.0),
            (2, TS(2), 1, "b", 0.0),
            (3, TS(3), 1, "a", 0.0),
            (4, TS(4), 1, "b", 0.0),
            (5, TS(1), 2, "a", 0.0),
            (6, TS(2), 2, "c", 0.0),
        ],
    )
    rows = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob_ppm"])
        for r in event_transitions(ev).collect()
    }
    assert rows[("a", "b")] == (2, 666667)
    assert rows[("a", "c")] == (1, 333333)
    assert rows[("b", "a")] == (1, 1_000_000)


def test_top_event_paths_caps_at_k(spark):
    ev = _ev(
        spark,
        [(i, TS(i), 1, t, 0.0) for i, t in enumerate(["a", "b", "c", "d", "e"], 1)]
        + [(10, TS(1), 2, "a", 0.0), (11, TS(2), 2, "b", 0.0)],
    )
    rows = {r["path"]: r["n_users"] for r in top_event_paths(ev, k=3).collect()}
    assert rows == {"a>b>c": 1, "a>b": 1}


def test_gap_fill_hourly_locf(spark):
    ev = _ev(
        spark,
        [
            (1, TS(1, 30), 1, "m", 10.0),
            (2, TS(1, 45), 1, "m", 11.0),  # same hour: later event wins
            (3, TS(4, 0), 1, "m", 40.0),  # hours 2,3 are gaps
        ],
    )
    rows = sorted(gap_fill_hourly(ev).collect(), key=lambda r: r["hour_idx"])
    assert [r["filled"] for r in rows] == [11.0, 11.0, 11.0, 40.0]
    assert [r["observed"] for r in rows] == [True, False, False, True]
    h0 = rows[0]["hour_idx"]
    assert [r["hour_idx"] - h0 for r in rows] == [0, 1, 2, 3]


def test_zscore_outliers_matches_naive(spark):
    import statistics

    # n must comfortably exceed z² + 1: a single extreme point's z is
    # bounded by sqrt(n-1), so at n=10 it can never pass z>3
    vals = [10.0 + 0.1 * (i % 7) for i in range(29)] + [50.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id BIGINT, g STRING, v DOUBLE"
    )
    got = sorted(r["id"] for r in zscore_outliers(df, ["g"], "v", z=3).collect())
    mu = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    want = sorted(i for i, v in enumerate(vals) if abs(v - mu) > 3 * sd)
    assert got == want == [29]


def test_cdc_chunks_duplicate_vs_unique(spark):
    # varied (non-periodic) text: a periodic string has only period-many
    # distinct hash windows and may never hit a boundary
    text = "".join(chr(97 + (i * i * 7 + i) % 26) for i in range(600))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "entirely different content with no twin here")],
        "doc_id BIGINT, text STRING",
    )
    rows = {r["id"]: r for r in cdc_chunk_stats(docs).collect()}
    assert rows[1]["shared_ppm"] == 1_000_000  # every chunk occurs in doc 2
    assert rows[2]["shared_ppm"] == 1_000_000
    assert rows[3]["shared_ppm"] == 0
    assert rows[1]["n_chunks"] >= 2  # mask=63 -> ~64-char chunks over 360 chars


def test_cdc_chunks_shift_robust(spark):
    # insert a char near the FRONT: fixed-size shingles would shift every
    # boundary; CDC must keep most tail chunks identical
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 10
    docs = spark.createDataFrame(
        [(1, base), (2, "X" + base)], "doc_id BIGINT, text STRING"
    )
    rows = {r["id"]: r for r in cdc_chunk_stats(docs).collect()}
    # most chunks of each doc also appear in the other
    assert rows[1]["shared_ppm"] > 500_000
    assert rows[2]["shared_ppm"] > 500_000


def test_outliers_plan_broadcasts_stats(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)], "id BIGINT, g STRING, v DOUBLE"
    )
    plan = zscore_outliers(df, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_behavior_plans_no_cartesian(spark):
    ev = _ev(spark, [(1, TS(1), 1, "a", 1.0), (2, TS(2), 1, "b", 2.0)])
    for df in (
        retention_cohorts(ev),
        event_transitions(ev),
        top_event_paths(ev),
        gap_fill_hourly(ev),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_step_window_bounds_gap(spark):
    ev = _ev(
        spark,
        [
            # user 1: view 1h after signup (inside 2h window)
            (1, TS(1), 1, "signup", 0.0),
            (2, TS(2), 1, "view", 0.0),
            # user 2: view 5h after signup (outside)
            (3, TS(1), 2, "signup", 0.0),
            (4, TS(6), 2, "view", 0.0),
        ],
    )
    out = {
        r["event_type"]: r["n_users"]
        for r in funnel_steps(
            ev, ["signup", "view"], step_within_us=2 * 3600 * 1_000_000
        ).collect()
    }
    assert out == {"signup": 2, "view": 1}
