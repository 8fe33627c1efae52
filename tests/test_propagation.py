"""Invariant tests for graph-propagation encoders, Sinkhorn re-rank,
and sessionization (stochastic/iterative ops — shapes, coverage,
determinism; SURVEY §5 test strategy)."""

import pytest
from pyspark.sql import functions as F

from klinker_spark.encoders.propagation import (
    GCNFrameEncoder,
    RelationAwarePropagationEncoder,
    propagate,
)
from klinker_spark.ops.rerank import sinkhorn_rerank
from klinker_spark.streaming.sessions import sessionize


@pytest.fixture
def tiny_graph(spark):
    conc = spark.createDataFrame(
        [("a", "alpha text"), ("b", "beta text"), ("c", "gamma value")],
        "id string, text string",
    )
    rels = spark.createDataFrame(
        [("a", "r1", "b"), ("b", "r2", "c"), ("a", "r1", "d")],
        "head string, rel string, tail string",
    )
    return conc, rels


def test_gcn_covers_all_graph_ids(spark, tiny_graph):
    conc, rels = tiny_graph
    out = GCNFrameEncoder(depth=2, dim=8).encode(conc, rels)
    ids = {r["id"] for r in out.select("id").collect()}
    # every entity in attrs ∪ heads ∪ tails, including attr-less 'd'
    assert ids == {"a", "b", "c", "d"}
    row = out.where(F.col("id") == "d").first()
    assert len(row["vector"]) == 8


def test_gcn_deterministic(spark, tiny_graph):
    """Same seed → same embeddings up to float-summation order (double
    addition is non-associative; aggregation order varies with
    partitioning, so the contract is approximate, not bit-exact)."""
    conc, rels = tiny_graph
    enc = GCNFrameEncoder(depth=2, dim=8)
    v1 = {r["id"]: r["vector"] for r in enc.encode(conc, rels).collect()}
    v2 = {r["id"]: r["vector"] for r in enc.encode(conc, rels).collect()}
    assert set(v1) == set(v2)
    for i in v1:
        assert v1[i] == pytest.approx(v2[i], abs=1e-9)


def test_gcn_md5_mode(spark, tiny_graph):
    # cross-engine-deterministic mode (exact oracle lives in
    # queries.gcn_propagation_md5); same coverage invariants here
    conc, rels = tiny_graph
    out = GCNFrameEncoder(depth=2, dim=8, hash_fn="md5").encode(conc, rels)
    rows = {r["id"]: r["vector"] for r in out.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert all(len(v) == 8 for v in rows.values())


def test_lightea_md5_mode_unit_norm(spark, tiny_graph):
    from klinker_spark.encoders.propagation import RelationAwarePropagationEncoder

    conc, rels = tiny_graph
    out = RelationAwarePropagationEncoder(depth=2, dim=8, hash_fn="md5").encode(conc, rels)
    for r in out.collect():
        n = sum(x * x for x in r["vector"]) ** 0.5
        assert n == pytest.approx(1.0, abs=1e-9) or n == pytest.approx(0.0, abs=1e-9)


def test_gcn_neighbors_influence(spark, tiny_graph):
    """A node's vector must differ from its pure init (propagation
    actually mixed neighbor information in)."""
    conc, rels = tiny_graph
    depth0 = GCNFrameEncoder(depth=0, dim=8).encode(conc, rels)
    depth2 = GCNFrameEncoder(depth=2, dim=8).encode(conc, rels)
    v0 = {r["id"]: r["vector"] for r in depth0.collect()}
    v2 = {r["id"]: r["vector"] for r in depth2.collect()}
    assert v0["a"] != v2["a"]


def test_relation_aware_differs_from_gcn(spark, tiny_graph):
    conc, rels = tiny_graph
    g = {r["id"]: r["vector"] for r in GCNFrameEncoder(depth=1, dim=8).encode(conc, rels).collect()}
    ra = {
        r["id"]: r["vector"]
        for r in RelationAwarePropagationEncoder(depth=1, dim=8).encode(conc, rels).collect()
    }
    assert set(g) == set(ra)
    assert g["a"] != ra["a"]


def test_relation_aware_unit_norm(spark, tiny_graph):
    conc, rels = tiny_graph
    out = RelationAwarePropagationEncoder(depth=2, dim=8).encode(conc, rels)
    norms = out.select(
        F.sqrt(F.aggregate(F.col("vector"), F.lit(0.0), lambda a, x: a + x * x)).alias("n")
    ).collect()
    for r in norms:
        assert r["n"] == pytest.approx(1.0, abs=1e-6)


def test_propagate_simple_average(spark):
    """One hop on a single edge with weight 1 copies the tail vector."""
    feat = spark.createDataFrame(
        [("x", [1.0, 2.0]), ("y", [0.0, 0.0])], "id string, vector array<double>"
    )
    edges = spark.createDataFrame([("y", "x", 1.0)], "head string, tail string, w double")
    out = {r["id"]: r["vector"] for r in propagate(feat, edges, depth=1, normalize=False).collect()}
    assert out["y"] == [1.0, 2.0]


def test_sinkhorn_rerank_invariants(spark):
    cand = spark.createDataFrame(
        [
            ("q1", "n1", 0.9),
            ("q1", "n2", 0.8),
            ("q2", "n1", 0.95),
            ("q2", "n3", 0.5),
        ],
        "query_id string, neighbor_id string, sim double",
    )
    out = sinkhorn_rerank(cand, iters=4).collect()
    # permutation of input pairs, rank contiguous from 1 per query
    assert {(r["query_id"], r["neighbor_id"]) for r in out} == {
        ("q1", "n1"), ("q1", "n2"), ("q2", "n1"), ("q2", "n3"),
    }
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
    # column normalization happened last → per-neighbor masses sum to 1
    col_sums = {}
    for r in out:
        col_sums[r["neighbor_id"]] = col_sums.get(r["neighbor_id"], 0.0) + r["score"]
    for s in col_sums.values():
        assert s == pytest.approx(1.0, abs=1e-9)
    # hub n1 (wanted by both queries) gets its mass split
    n1 = {r["query_id"]: r["score"] for r in out if r["neighbor_id"] == "n1"}
    assert 0 < n1["q1"] < 1 and 0 < n1["q2"] < 1


def test_sessionize_batch_golden(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 01:00:00"),  # 50 min gap → new session
            (2, "2024-01-01 00:00:00"),
        ],
        "user_id int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(ev, gap="30 minutes").collect()
    sess = {(r["user_id"], r["n_events"]) for r in out}
    assert sess == {(1, 2), (1, 1), (2, 1)}
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["session_start_ms"])
    assert u1[0]["n_events"] == 2 and u1[1]["n_events"] == 1


def test_sessionize_streaming_plan(spark, tmp_path):
    """Streaming path builds a session_window plan and runs to memory
    sink with availableNow."""
    src = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "user_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "ev")
    src.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = sessionize(stream, gap="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from sess_test").collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 1


def test_lightea_threeview_matches_numpy_reference(spark, tiny_graph):
    """LightEAEncoder == a direct numpy transcription of the reference
    algorithm (light_ea.py:117-248): forward/reverse relation split,
    ent-ent multiplicity + degree diagonal, rel<-heads / ent<-rels
    views, x/(||x||+1e-8) per hop, concat + final normalize."""
    import numpy as np

    from klinker_spark.encoders.hashing import initialize_and_fill
    from klinker_spark.encoders.propagation import LightEAEncoder

    conc, rels = tiny_graph
    dim, depth = 4, 2
    enc = LightEAEncoder(depth=depth, dim=dim)
    got = {r["id"]: np.array(r["vector"]) for r in enc.encode(conc, rels).collect()}

    # --- numpy reference ---
    ids_df = (
        conc.select("id")
        .union(rels.select(F.col("head").alias("id")))
        .union(rels.select(F.col("tail").alias("id")))
        .distinct()
    )
    feat0_rows = initialize_and_fill(
        ids_df, enc.attr_encoder.encode(conc), dim, enc.seed
    ).collect()
    ids = sorted(r["id"] for r in feat0_rows)
    idx = {e: i for i, e in enumerate(ids)}
    feat0 = np.zeros((len(ids), dim))
    for r in feat0_rows:
        feat0[idx[r["id"]]] = r["vector"]

    trips = set()
    for r in rels.collect():
        trips.add((r["head"], r["tail"], r["rel"] + ">"))
        trips.add((r["tail"], r["head"], r["rel"] + "<"))
    rel_ids = sorted({t[2] for t in trips})
    ridx = {r: i for i, r in enumerate(rel_ids)}
    n, m = len(ids), len(rel_ids)
    ee = np.zeros((n, n))
    rel_ent = np.zeros((m, n))
    ent_rel = np.zeros((n, m))
    for h, t, r in trips:
        ee[idx[h], idx[t]] += 1
        ee[idx[h], idx[h]] += 1
        ee[idx[t], idx[t]] += 1
        rel_ent[ridx[r], idx[h]] = 1
        ent_rel[idx[t], ridx[r]] = 1

    def mynorm(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)

    ent, rel = feat0, np.zeros((m, dim))
    ent_list = [feat0]
    for _ in range(depth):
        new_rel = mynorm(rel_ent @ ent)
        new_ent = mynorm(ee @ ent + ent_rel @ rel)
        ent, rel = new_ent, new_rel
        ent_list.append(ent)
    cat = np.concatenate(ent_list, axis=1)
    expect = cat / np.maximum(np.linalg.norm(cat, axis=1, keepdims=True), 1e-12)

    assert set(got) == set(ids)
    for e in ids:
        np.testing.assert_allclose(got[e], expect[idx[e]], atol=1e-9)
