"""BFS distances, Pareto skyline, per-key reservoir — semantics on
hand-built graphs/frames plus a naive-model parity check for the
skyline."""

from __future__ import annotations

from pyspark.sql import functions as F

from klinker_spark.ops.curation import per_key_reservoir
from klinker_spark.ops.graph import bfs_distances
from klinker_spark.ops.rollup import pareto_frontier


def test_bfs_distances_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "a STRING, b STRING",
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, ["a"], max_depth=3).collect()}
    # depth cap: e (dist 4) absent; disconnected x/y absent
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_multi_source_min(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "a STRING, b STRING"
    )
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, ["a", "d"], max_depth=4).collect()}
    assert got == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_bfs_early_exit_on_empty_frontier(spark):
    edges = spark.createDataFrame([("a", "b")], "a STRING, b STRING")
    got = bfs_distances(edges, ["a"], max_depth=10).collect()
    assert {r["node"]: r["dist"] for r in got} == {"a": 0, "b": 1}


def _naive_skyline(rows):
    """O(n²) dominance check: keep rows not dominated; among duplicate
    (mx, mn) points keep the smallest tie."""
    out = []
    best = {}
    for k, g, mx, mn in rows:
        if (g, mx, mn) not in best or k < best[(g, mx, mn)]:
            best[(g, mx, mn)] = k
    for k, g, mx, mn in rows:
        if best[(g, mx, mn)] != k:
            continue
        dominated = any(
            g2 == g
            and mx2 >= mx
            and mn2 <= mn
            and (mx2 > mx or mn2 < mn)
            for _, g2, mx2, mn2 in rows
        )
        if not dominated:
            out.append(k)
    return sorted(out)


def test_pareto_frontier_matches_naive(spark):
    rows = [
        (1, "g", 10, 5),
        (2, "g", 8, 3),
        (3, "g", 8, 7),   # dominated by 1 (10>8, 5<7)
        (4, "g", 12, 9),
        (5, "g", 10, 5),  # duplicate of 1 -> first-wins dedup keeps 1
        (6, "h", 1, 1),
    ]
    df = spark.createDataFrame(rows, "k BIGINT, g STRING, mx BIGINT, mn BIGINT")
    got = sorted(r["k"] for r in pareto_frontier(df, "g", "mx", "mn", "k").collect())
    assert got == _naive_skyline(rows) == [1, 2, 4, 6]


def test_per_key_reservoir_cap_and_determinism(spark):
    df = spark.createDataFrame(
        [(u, i) for u in (1, 2) for i in range(u * 100, u * 100 + 10)]
        + [(3, 999)],
        "user_id BIGINT, event_id BIGINT",
    )
    out = per_key_reservoir(df, "user_id", 3, "event_id")
    counts = {r["user_id"]: r["n"] for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 3, 2: 3, 3: 1}  # min(k, group size)
    again = per_key_reservoir(df, "user_id", 3, "event_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_hits_two_hub_graph(spark):
    from klinker_spark.ops.graph import hits

    # hub c1 points at 3 authorities, c2 at 1; authority p1 shared
    edges = spark.createDataFrame(
        [("c1", "p1"), ("c1", "p2"), ("c1", "p3"), ("c2", "p1")],
        "c STRING, p STRING",
    )
    rows = {(r["kind"], r["node"]): r["score_ppm"] for r in hits(edges, iters=2).collect()}
    # c1 must out-score c2 as a hub; p1 (pointed at by both) out-scores p2/p3
    assert rows[("hub", "c1")] > rows[("hub", "c2")]
    assert rows[("auth", "p1")] > rows[("auth", "p2")]
    assert rows[("auth", "p2")] == rows[("auth", "p3")]
    # L1 normalization: each side sums to ~1e6 (half-up rounding slack)
    assert abs(sum(v for (k, _), v in rows.items() if k == "hub") - 1_000_000) <= 2
    assert abs(sum(v for (k, _), v in rows.items() if k == "auth") - 1_000_000) <= 2


def test_global_pareto_two_phase_equals_direct(spark):
    from klinker_spark.ops.rollup import pareto_frontier, pareto_frontier_global

    # deterministic pseudo-random points, including duplicates
    rows = [(k, (k * 7919) % 101, (k * 104729) % 97) for k in range(300)]
    rows += [(1000 + k, (k * 7919) % 101, (k * 104729) % 97) for k in range(5)]
    df = spark.createDataFrame(rows, "k BIGINT, mx BIGINT, mn BIGINT")
    direct = pareto_frontier(df.withColumn("_g", F.lit(0)), "_g", "mx", "mn", "k")
    two_phase = pareto_frontier_global(df, "mx", "mn", "k", n_salts=8)
    a = sorted(r["k"] for r in direct.collect())
    b = sorted(r["k"] for r in two_phase.collect())
    assert a == b and len(a) >= 1


def test_personalized_pagerank_concentrates_near_seed(spark):
    from klinker_spark.ops.graph import pagerank

    # two disjoint chains; seed in chain 1 -> chain 2 gets zero mass
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z")], "head STRING, tail STRING"
    )
    rows = {r["node"]: r["rank_micro"] for r in pagerank(edges, sources=["a"]).collect()}
    assert rows["a"] > rows["b"] > rows["c"] > 0
    assert rows["x"] == rows["y"] == rows["z"] == 0
