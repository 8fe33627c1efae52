"""Tests for attribute-value clustering blocking (M15) and blocking
comparison metrics (E9)."""

import pytest
from pyspark.sql import functions as F

from klinker_spark.blockers.attribute_clustering import AttributeClusteringBlocker
from klinker_spark.blockers.standard import StandardBlocker
from klinker_spark.data.frames import EntityFrame
from klinker_spark.eval import compare_blockings, dice


@pytest.fixture
def ab_frames(spark):
    left = EntityFrame(
        spark.createDataFrame(
            [("a1", "name", "red apple"), ("a2", "name", "green apple"), ("a3", "name", "zebra")],
            "id string, prop string, value string",
        ),
        "A",
    )
    right = EntityFrame(
        spark.createDataFrame(
            [("b1", "name", "red apple"), ("b2", "name", "zebra"), ("b3", "name", "zebra stripes")],
            "id string, prop string, value string",
        ),
        "B",
    )
    return left, right


def test_attribute_clustering_blocker(spark, ab_frames):
    left, right = ab_frames
    bm = AttributeClusteringBlocker(n_clusters=2, dim=8).assign(left, right)
    rows = bm.df.collect()
    # every block key is a cluster label; both sides non-empty per block
    assert all(r["block_key"].startswith("clustering_label_") for r in rows)
    # identical values land in the same cluster → a1/b1 must share a block
    shared = [
        r for r in rows if "a1" in r["A"] and "b1" in r["B"]
    ]
    assert shared


def test_attribute_clustering_deterministic(spark, ab_frames):
    left, right = ab_frames
    b1 = AttributeClusteringBlocker(n_clusters=2, dim=8).assign(left, right)
    b2 = AttributeClusteringBlocker(n_clusters=2, dim=8).assign(left, right)
    p1 = {(r["left_id"], r["right_id"]) for r in b1.pairs().collect()}
    p2 = {(r["left_id"], r["right_id"]) for r in b2.pairs().collect()}
    assert p1 == p2


def test_dice():
    assert dice(3, 5, 2) == pytest.approx(0.5)
    assert dice(0, 0, 0) == 0.0


def test_compare_blockings(spark):
    left = EntityFrame(
        spark.createDataFrame(
            [("a1", "k", "x"), ("a2", "k", "y")], "id string, prop string, value string"
        ),
        "A",
    )
    right = EntityFrame(
        spark.createDataFrame(
            [("b1", "k", "x"), ("b2", "k", "z")], "id string, prop string, value string"
        ),
        "B",
    )
    bm_x = StandardBlocker("k").assign(left, right)  # blocks a1-b1 (value x)
    # second blocking: everything in one block
    left2 = EntityFrame(
        left.attrs.withColumn("value", F.lit("all")), "A"
    )
    right2 = EntityFrame(right.attrs.withColumn("value", F.lit("all")), "B")
    bm_all = StandardBlocker("k").assign(left2, right2)
    gold = spark.createDataFrame([("a1", "b1"), ("a2", "b2")], "l string, r string")
    cmp = compare_blockings(bm_x, bm_all, gold)
    assert cmp["tp_a"] == 1 and cmp["tp_b"] == 2
    assert cmp["tp_common"] == 1 and cmp["only_b"] == 1
    assert cmp["tp_dice"] == pytest.approx(2 * 1 / 3)
    assert cmp["combined_recall"] == pytest.approx(1.0)


def test_hybrid_composite_with_embedding_rel_blocker(spark):
    """E6: CompositeUniqueNameBlocker with an embedding relation branch
    (hybrid.py:15-178 shape)."""
    from pyspark.sql import functions as F
    from klinker_spark.blockers.composite import CompositeUniqueNameBlocker
    from klinker_spark.blockers.token import TokenBlocker
    from klinker_spark.embedding.blockbuilder import KNNBlockBuilder
    from klinker_spark.embedding.blocker import EmbeddingBlocker

    left = EntityFrame(
        spark.createDataFrame(
            [("a1", "name", "unique-key-1"), ("a2", "name", "red apple"), ("a3", "name", "blue")],
            "id string, prop string, value string",
        ),
        "A",
    )
    right = EntityFrame(
        spark.createDataFrame(
            [("b1", "name", "unique-key-1"), ("b2", "name", "red apple")],
            "id string, prop string, value string",
        ),
        "B",
    )
    rels = spark.createDataFrame(
        [("a2", "r", "a3"), ("b2", "r", "b1")], "head string, rel string, tail string"
    )
    comp = CompositeUniqueNameBlocker(
        attribute_blocker=TokenBlocker(),
        relation_blocker=EmbeddingBlocker(block_builder=KNNBlockBuilder(k=1)),
    )
    bm = comp.assign(left, right, rels, rels)
    pairs = {(r["left_id"], r["right_id"]) for r in bm.pairs().collect()}
    # unique-name pass must link a1-b1; embedding/attr branches add more
    assert ("a1", "b1") in pairs


def test_dbscan_labels_clusters_border_noise(spark):
    """Hand-built ε-graph: two dense clusters, one isolated noise
    point.  Labels are the smallest member id; noise is '-1'."""
    import math

    from klinker_spark.ops.clustering import dbscan_labels

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [
        # cluster A: 3 mutually-close points around 0°
        ("a1", at(0)), ("a2", at(5)), ("a3", at(10)),
        # cluster B: 3 mutually-close points around 120°
        ("b1", at(120)), ("b2", at(125)), ("b3", at(130)),
        # noise: alone at 240°
        ("z1", at(240)),
    ]
    emb = spark.createDataFrame(rows, "id string, vector array<double>")
    # min_sim=cos(12°)≈0.978: within-cluster pairs connect, nothing else
    got = {r["id"]: r["label"] for r in dbscan_labels(emb, min_sim=0.978, min_pts=3).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1",
        "b1": "b1", "b2": "b1", "b3": "b1",
        "z1": "-1",
    }


def test_dbscan_border_attaches_noise_isolated(spark):
    """min_pts=3 with a chain a-b-c-d: b,c are core (3 neighbors incl
    self... a,d have 2) -> a,d are border, attach to the core cluster."""
    import math

    from klinker_spark.ops.clustering import dbscan_labels

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # chain: consecutive points 8° apart; ε=cos(10°) links only neighbors
    emb = spark.createDataFrame(
        [("a", at(0)), ("b", at(8)), ("c", at(16)), ("d", at(24)), ("z", at(200))],
        "id string, vector array<double>",
    )
    got = {r["id"]: r["label"] for r in dbscan_labels(emb, min_sim=0.985, min_pts=3).collect()}
    # b and c are core (2 neighbors + self); a and d are border via b/c
    assert got["b"] == "b" and got["c"] == "b"
    assert got["a"] == "b" and got["d"] == "b"
    assert got["z"] == "-1"


def test_attribute_clustering_dbscan_noise_handling(spark, frame_a, frame_b):
    from klinker_spark.blockers.attribute_clustering import AttributeClusteringBlocker

    kw = dict(dim=16, method="dbscan", min_sim=0.5, min_pts=2)
    keep = AttributeClusteringBlocker(noise_handling="keep", **kw).assign(frame_a, frame_b)
    remove = AttributeClusteringBlocker(noise_handling="remove", **kw).assign(frame_a, frame_b)
    token = AttributeClusteringBlocker(noise_handling="token", **kw).assign(frame_a, frame_b)
    keep_keys = {r["block_key"] for r in keep.block_pairs().select("block_key").distinct().collect()}
    remove_keys = {r["block_key"] for r in remove.block_pairs().select("block_key").distinct().collect()}
    token_keys = {r["block_key"] for r in token.block_pairs().select("block_key").distinct().collect()}
    # remove drops the -1 block; token renames noise per-value
    assert "clustering_label_-1" not in remove_keys
    assert "clustering_label_-1" not in token_keys
    assert remove_keys <= keep_keys
    with pytest.raises(ValueError, match="noise_handling"):
        AttributeClusteringBlocker(noise_handling="bogus")
    with pytest.raises(ValueError, match="method"):
        AttributeClusteringBlocker(method="bogus")


# ------------------------------------------------------------------ HDBSCAN
# Invariant tests on fixed 2-D points, mirroring the hdbscan-library
# conventions the reference relies on (ref attribute_clustering.py:18-21,
# test_blockbuilder.py:37-138): -1 noise, min_cluster_size condensation,
# root unselectable without allow_single_cluster, variable-density
# clusters that a single-eps DBSCAN cannot separate.

def _pts2(spark, rows):
    return spark.createDataFrame(rows, "id string, vector array<double>")


def test_hdbscan_two_blobs_and_noise(spark):
    """Two well-separated dense blobs + far outliers: two clusters
    labeled by smallest member id, outliers -1."""
    from klinker_spark.ops.clustering import hdbscan_labels

    blob_a = [(f"a{i}", [0.0 + 0.01 * i, 0.0 + 0.007 * i]) for i in range(5)]
    blob_b = [(f"b{i}", [5.0 + 0.01 * i, 5.0 - 0.006 * i]) for i in range(5)]
    noise = [("z1", [100.0, -40.0]), ("z2", [-80.0, 55.0])]
    got = {
        r["id"]: r["label"]
        for r in hdbscan_labels(
            _pts2(spark, blob_a + blob_b + noise), min_cluster_size=4, min_samples=3
        ).collect()
    }
    assert {got[f"a{i}"] for i in range(5)} == {"a0"}
    assert {got[f"b{i}"] for i in range(5)} == {"b0"}
    assert got["z1"] == "-1" and got["z2"] == "-1"


def test_hdbscan_single_blob_root_convention(spark):
    """A single uniform blob: with allow_single_cluster=False (the
    hdbscan default) the root is unselectable -> all noise; with True
    the blob is one cluster."""
    from klinker_spark.ops.clustering import hdbscan_labels

    rows = [(f"p{i}", [0.01 * i, 0.013 * (i % 3)]) for i in range(8)]
    strict = {
        r["id"]: r["label"]
        for r in hdbscan_labels(_pts2(spark, rows), min_cluster_size=4).collect()
    }
    assert set(strict.values()) == {"-1"}
    loose = {
        r["id"]: r["label"]
        for r in hdbscan_labels(
            _pts2(spark, rows), min_cluster_size=4, allow_single_cluster=True
        ).collect()
    }
    assert set(loose.values()) == {"p0"} and len(loose) == 8


def test_hdbscan_min_cluster_size_condensation(spark):
    """Two big blobs + a 3-point clump: the clump is its OWN cluster at
    mcs=3 (true split); at mcs=4 it is condensed away — its points fall
    out of the A-side cluster early and, per the hdbscan library's
    default do_labelling (points climbing to their nearest SELECTED
    ancestor), are labeled as members of that cluster; only root
    fall-outs are noise.  Both big blobs persist either way."""
    from klinker_spark.ops.clustering import hdbscan_labels

    big_a = [(f"a{i}", [0.01 * i, 0.0]) for i in range(6)]
    small = [("s1", [5.0, 0.0]), ("s2", [5.01, 0.0]), ("s3", [5.02, 0.0])]
    big_b = [(f"b{i}", [12.0 + 0.01 * i, 0.0]) for i in range(6)]
    emb = _pts2(spark, big_a + small + big_b)
    at3 = {r["id"]: r["label"] for r in hdbscan_labels(emb, min_cluster_size=3, min_samples=2).collect()}
    assert at3["s1"] == at3["s2"] == at3["s3"] == "s1"
    assert {at3[f"a{i}"] for i in range(6)} == {"a0"}
    assert {at3[f"b{i}"] for i in range(6)} == {"b0"}
    at4 = {r["id"]: r["label"] for r in hdbscan_labels(emb, min_cluster_size=4, min_samples=2).collect()}
    assert at4["s1"] == at4["s2"] == at4["s3"] == "a0"  # absorbed, not noise
    assert {at4[f"a{i}"] for i in range(6)} == {"a0"}
    assert {at4[f"b{i}"] for i in range(6)} == {"b0"}


def test_hdbscan_all_structure_in_root_is_noise(spark):
    """hdbscan convention check: one big blob plus a sub-mcs satellite
    never true-splits, so ALL structure lives in the unselectable root
    -> everything is noise (the documented allow_single_cluster=False
    gotcha), while allow_single_cluster=True selects the root."""
    from klinker_spark.ops.clustering import hdbscan_labels

    big = [(f"a{i}", [0.01 * i, 0.0]) for i in range(6)]
    small = [("s1", [5.0, 5.0]), ("s2", [5.01, 5.0]), ("s3", [5.02, 5.0])]
    emb = _pts2(spark, big + small)
    strict = {r["id"]: r["label"] for r in hdbscan_labels(emb, min_cluster_size=4, min_samples=2).collect()}
    assert set(strict.values()) == {"-1"}
    loose = {
        r["id"]: r["label"]
        for r in hdbscan_labels(
            emb, min_cluster_size=4, min_samples=2, allow_single_cluster=True
        ).collect()
    }
    assert len(set(loose.values())) == 1 and "-1" not in set(loose.values())


def test_hdbscan_variable_density(spark):
    """The HDBSCAN advantage: a tight blob (spacing 0.01) and a loose
    blob (spacing 1.0) separated by 30 units are BOTH found — no single
    eps works for that (eps > 1 merges nothing tight-side-specific,
    eps < 1 dissolves the loose blob)."""
    from klinker_spark.ops.clustering import hdbscan_labels

    tight = [(f"t{i}", [0.01 * i, 0.0]) for i in range(5)]
    loose = [(f"l{i}", [30.0 + 1.0 * i, 0.0]) for i in range(5)]
    got = {
        r["id"]: r["label"]
        for r in hdbscan_labels(
            _pts2(spark, tight + loose), min_cluster_size=4, min_samples=2
        ).collect()
    }
    assert {got[f"t{i}"] for i in range(5)} == {"t0"}
    assert {got[f"l{i}"] for i in range(5)} == {"l0"}


def test_hdbscan_order_and_partition_invariance(spark):
    """Labels are independent of row order / partition layout
    (deterministic MST total order + smallest-member naming)."""
    from klinker_spark.ops.clustering import hdbscan_labels

    rows = (
        [(f"a{i}", [0.02 * i, 0.01 * i]) for i in range(5)]
        + [(f"b{i}", [7.0 + 0.02 * i, 0.01 * i]) for i in range(5)]
        + [("z", [50.0, 50.0])]
    )
    base = {
        r["id"]: r["label"]
        for r in hdbscan_labels(_pts2(spark, rows), min_cluster_size=4).collect()
    }
    perm = _pts2(spark, rows[::-1]).repartition(7)
    again = {
        r["id"]: r["label"] for r in hdbscan_labels(perm, min_cluster_size=4).collect()
    }
    assert base == again


def test_hdbscan_knn_sparsification_agrees(spark):
    """k_graph sparsification (the corpus-scale path) reproduces the
    exact-graph labels on well-separated blobs."""
    from klinker_spark.ops.clustering import hdbscan_labels

    rows = [(f"a{i}", [0.02 * i, 0.0]) for i in range(5)] + [
        (f"b{i}", [9.0 + 0.02 * i, 0.0]) for i in range(5)
    ]
    emb = _pts2(spark, rows)
    exact = {r["id"]: r["label"] for r in hdbscan_labels(emb, min_cluster_size=4).collect()}
    sparse = {
        r["id"]: r["label"]
        for r in hdbscan_labels(emb, min_cluster_size=4, k_graph=6).collect()
    }
    assert exact == sparse


def test_attribute_clustering_hdbscan_method(spark):
    """method='hdbscan' runs the real hierarchy over distinct values:
    two value families cluster, noise handling applies to '-1'."""
    from klinker_spark.blockers.attribute_clustering import AttributeClusteringBlocker
    from klinker_spark.data.frames import EntityFrame

    def melt_rows(rows, name):
        df = spark.createDataFrame(rows, "id string, value string")
        return EntityFrame(df.select("id", F.lit("attr").alias("attribute"), "value")
                           if "attribute" not in df.columns else df, name)

    left_rows = [(f"l{i}", f"alpha common {i % 2}") for i in range(4)] + [
        ("lx", "totally unique left value zzz")
    ]
    right_rows = [(f"r{i}", f"alpha common {i % 2}") for i in range(4)] + [
        ("rx", "different unique right thing qqq")
    ]
    left = melt_rows(left_rows, "L")
    right = melt_rows(right_rows, "R")
    bm = AttributeClusteringBlocker(
        method="hdbscan", dim=16, min_cluster_size=2, noise_handling="remove"
    ).assign(left, right)
    pairs = {(r["left_id"], r["right_id"]) for r in bm.block_pairs().collect()}
    # the shared 'alpha common *' family pairs across sides
    assert any(l.startswith("l") and r.startswith("r") for l, r in pairs)
    keys = {r["block_key"] for r in bm.block_pairs().collect()}
    assert all(k.startswith("clustering_label_") for k in keys)


def test_hdbscan_probabilities(spark):
    """probabilities=True: densest-core members reach 1.0, an early
    fall-out scores strictly lower, noise scores 0."""
    from klinker_spark.ops.clustering import hdbscan_labels

    blob = [(f"a{i}", [0.01 * i, 0.0]) for i in range(5)]
    straggler = [("a9", [0.5, 0.0])]     # joins the blob late (far)
    other = [(f"b{i}", [9.0 + 0.01 * i, 0.0]) for i in range(5)]
    noise = [("z", [100.0, 100.0])]
    emb = spark.createDataFrame(
        blob + straggler + other + noise, "id string, vector array<double>"
    )
    got = {
        r["id"]: (r["label"], r["probability"])
        for r in hdbscan_labels(
            emb, min_cluster_size=4, min_samples=2, probabilities=True
        ).collect()
    }
    assert got["z"] == ("-1", 0.0)
    assert got["a9"][0] == "a0" and got["a9"][1] < 1.0
    assert max(p for l, p in got.values() if l == "a0") == 1.0
    assert all(0.0 <= p <= 1.0 for _, p in got.values())


def test_boruvka_mst_matches_kruskal(spark):
    """Distributed Borůvka produces a minimum spanning forest of the
    same total weight as a reference Kruskal on random weighted graphs
    (including a disconnected one), and exactly n - #components edges."""
    import itertools
    import random

    from klinker_spark.ops.clustering import boruvka_mst

    def kruskal_weight(n_ids, edges):
        parent = {i: i for i in n_ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        total, used = 0.0, 0
        for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
                total += w
                used += 1
        return total, used

    rng = random.Random(5)
    for trial, n in ((1, 9), (2, 14)):
        ids = [f"v{i}" for i in range(n)]
        # trial 2: two disconnected halves
        halves = [ids] if trial == 1 else [ids[: n // 2], ids[n // 2:]]
        edges = []
        for grp in halves:
            for a, b in itertools.combinations(grp, 2):
                if rng.random() < 0.6:
                    edges.append((min(a, b), max(a, b), round(rng.uniform(0.1, 9.9), 1)))
        # ensure each half connected: chain edges
        for grp in halves:
            for a, b in zip(grp, grp[1:]):
                edges.append((min(a, b), max(a, b), round(rng.uniform(0.1, 9.9), 1)))
        edges = list({(a, b): (a, b, w) for a, b, w in sorted(edges, key=lambda e: -e[2])}.values())
        e_df = spark.createDataFrame(edges, "a string, b string, w double")
        v_df = spark.createDataFrame([(i,) for i in ids], "id string")
        got = [(r["a"], r["b"], r["w"]) for r in boruvka_mst(e_df, v_df).collect()]
        want_total, want_edges = kruskal_weight(ids, edges)
        assert len(got) == want_edges == n - len(halves)
        assert abs(sum(w for _, _, w in got) - want_total) < 1e-9
