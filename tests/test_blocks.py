"""BlockManager stats / pairs / combine goldens, ported from the
reference's ``tests/test_blocks.py:20-90`` fixture values.
"""

from __future__ import annotations

import pytest

from klinker_spark.data.blocks import BlockManager

from conftest import blocks_as_dict

BLOCKS_DICT = {
    2: (["3"], ["3", "5"]),
    4: (["4"], ["5"]),
    5: (["4"], ["4"]),
    6: (["4", "5"], ["4"]),
    7: (["5"], ["4"]),
    10: (["1", "2"], ["2"]),
    11: (["2"], ["2"]),
}


@pytest.fixture()
def blocks(spark):
    return BlockManager.from_dict(spark, BLOCKS_DICT)


def test_block_sizes(blocks):
    sized = {r["block_key"]: r["assignments"] for r in blocks.with_sizes().collect()}
    assert sized == {"2": 3, "4": 2, "5": 2, "6": 3, "7": 2, "10": 3, "11": 2}


def test_statistics(blocks):
    row = blocks.statistics().collect()[0]
    assert row["n_blocks"] == 7
    assert row["total_assignments"] == 17
    # mean block size over both sides: 17/7
    assert (row["total_assignments"] / row["n_blocks"]) == pytest.approx(2.4285714285714284)
    # reference pair list has 10 entries (duplicates kept)
    assert row["total_comparisons"] == 10


def test_all_pairs_with_duplicates(blocks):
    pairs = sorted(tuple(r) for r in blocks.pairs(distinct=False).collect())
    expected = sorted(
        [
            ("3", "3"),
            ("3", "5"),
            ("4", "5"),
            ("4", "4"),
            ("4", "4"),
            ("5", "4"),
            ("5", "4"),
            ("1", "2"),
            ("2", "2"),
            ("2", "2"),
        ]
    )
    assert pairs == expected


def test_combine(spark, blocks):
    other = BlockManager.from_dict(
        spark, {6: BLOCKS_DICT[6], 4: (["1", "2"], ["5"]), 20: (["5"], ["7"])}
    )
    expected = {str(k): (set(v[0]), set(v[1])) for k, v in BLOCKS_DICT.items()}
    expected["4"] = ({"1", "2", "4"}, {"5"})
    expected["20"] = ({"5"}, {"7"})
    assert blocks_as_dict(blocks.combine(other)) == expected


def test_find_blocks(blocks):
    keys = {r["block_key"] for r in blocks.find_blocks("4").collect()}
    assert keys == {"4", "5", "6", "7"}
    keys_left = {r["block_key"] for r in blocks.find_blocks("4", side="A").collect()}
    assert keys_left == {"4", "5", "6"}


def test_purge_keeps_small_blocks(spark):
    # 20 blocks of cardinality 1, 10 of cardinality 2, one giant block.
    # Walking blocks by ascending comparison count, the rounded
    # cumulative CC plateaus when the cardinality-2 run starts
    # (cc 2.0 -> 1.95, equal at round 0), setting the purge threshold
    # at 2 comparisons: the giant block must be dropped.
    d = {f"k{i:02d}": ([f"a{i}"], [f"b{i}"]) for i in range(20)}
    for i in range(10):
        d[f"m{i}"] = ([f"c{i}"], [f"d{i}", f"e{i}"])
    d["giant"] = ([f"a{i}" for i in range(50)], [f"b{i}" for i in range(50)])
    bm = BlockManager.from_dict(spark, d)
    purged = blocks_as_dict(bm.purge(cc_round=0))
    assert "giant" not in purged
    assert len(purged) == 30


def test_read_nn_wide_reference_layout(spark, tmp_path):
    """The reference's NN parquet (dask wide frame: index = left id,
    one scalar column per neighbor slot, None padding — blocks.py:
    374-381, 466-527) must sniff into block form with nulls dropped."""
    import pandas as pd

    from klinker_spark.data.blocks import BlockManager

    path = str(tmp_path / "nn")
    pdf = pd.DataFrame(
        {"0": ["b1", "b2", "b9"], "1": ["b7", None, "b3"]},
        index=pd.Index(["a1", "a2", "a3"]),
    )
    pdf.to_parquet(path)  # pandas stores the index like dask does
    bm = BlockManager.read_parquet(spark, path, "L", "R")
    got = {
        r["block_key"]: (list(r["L"]), sorted(r["R"])) for r in bm.df.collect()
    }
    assert got == {
        "a1": (["a1"], ["b1", "b7"]),
        "a2": (["a2"], ["b2"]),  # None slot dropped
        "a3": (["a3"], ["b3", "b9"]),
    }


def test_composite_parquet_roundtrip(spark, tmp_path, blocks):
    """blocks/ + nn_blocks/ two-subdir layout (reference
    CompositeWithNNBasedKlinkerBlockManager, blocks.py:560-652):
    written by CompositeBlockManager, sniffed back on read, pairs
    chain both parts."""
    import pandas as pd

    from klinker_spark.data.blocks import BlockManager, CompositeBlockManager

    root = str(tmp_path / "composite")
    nn_src = str(tmp_path / "nn_src")
    pd.DataFrame({"0": ["b8"]}, index=pd.Index(["a9"])).to_parquet(nn_src)
    nn = BlockManager.read_parquet(spark, nn_src, "A", "B")
    comp = CompositeBlockManager(blocks, nn)
    comp.to_parquet(root)
    back = BlockManager.read_parquet(spark, root, "A", "B")
    assert isinstance(back, CompositeBlockManager)
    base_pairs = {tuple(r) for r in blocks.pairs().collect()}
    got = {tuple(r) for r in back.pairs().collect()}
    assert got == base_pairs | {("a9", "b8")}


def _km(spark, left_rows, right_rows):
    from klinker_spark.session import local_df

    return BlockManager.from_key_assignments(
        local_df(spark, left_rows, "block_key string, id string"),
        local_df(spark, right_rows, "block_key string, id string"),
        "A",
        "B",
        assume_distinct=True,
    )


def test_key_combine_matches_array_combine_with_one_sided_keys(spark):
    """Regression: raw (block_key, id) assignments are one SIDE of an
    inner join — a key held on only one side of a manager is an
    assignment but never a block.  The key-level combine must filter
    those out before unioning, or they pair up with the OTHER manager's
    one-sided assignments as phantom blocks (lesson 14)."""
    # key "x" is left-only in bm1 and right-only in bm2 — a phantom
    # block if raw frames were unioned; "k" is a real block in both.
    bm1 = _km(spark, [("k", "a1"), ("x", "a9")], [("k", "b1")])
    bm2 = _km(spark, [("k", "a2")], [("k", "b2"), ("x", "b9")])
    key_pairs = {tuple(r) for r in bm1.combine(bm2).block_pairs().collect()}
    arr_pairs = {
        tuple(r)
        for r in BlockManager(bm1.df, "A", "B")
        .combine(BlockManager(bm2.df, "A", "B"))
        .block_pairs()
        .collect()
    }
    assert key_pairs == arr_pairs
    assert ("x", "a9", "b9") not in key_pairs
    assert key_pairs == {
        ("k", "a1", "b1"),
        ("k", "a1", "b2"),
        ("k", "a2", "b1"),
        ("k", "a2", "b2"),
    }
    # the combined manager's array view matches the array path too
    assert blocks_as_dict(bm1.combine(bm2)) == blocks_as_dict(
        BlockManager(bm1.df, "A", "B").combine(BlockManager(bm2.df, "A", "B"))
    )


def test_covered_ids_excludes_one_sided_assignments(spark):
    """covered_ids must report only entities in actual blocks: a9/b9
    hold one-sided values and stay uncovered for the composite
    anti-join."""
    bm = _km(spark, [("k", "a1"), ("x", "a9")], [("k", "b1"), ("y", "b9")])
    assert {r["id"] for r in bm.covered_ids("A").collect()} == {"a1"}
    assert {r["id"] for r in bm.covered_ids("B").collect()} == {"b1"}
    # array-layout path agrees
    arr = BlockManager(bm.df, "A", "B")
    assert {r["id"] for r in arr.covered_ids("A").collect()} == {"a1"}


def test_persisted_key_manager_keeps_semantics(spark):
    raw = _km(spark, [("k", "a1"), ("x", "a9")], [("k", "b1")])
    bm = raw.persisted()  # raw cache: one-sided keys stay in the frames
    assert not bm.keys_effective
    assert {tuple(r) for r in bm.block_pairs().collect()} == {("k", "a1", "b1")}
    assert blocks_as_dict(bm) == {"k": ({"a1"}, {"b1"})}
    eff = raw.persisted(effective=True)  # block-filtered cache
    assert eff.keys_effective
    assert {r["id"] for r in eff.left_keys.collect()} == {"a1"}
    assert {tuple(r) for r in eff.block_pairs().collect()} == {("k", "a1", "b1")}


def test_combine_all_falls_back_to_array_path_for_df_layout(spark):
    """ADVICE r9: combine_all on a mix of key-framed and array-layout
    managers (from_dict / read_parquet) must not assume key frames —
    it falls back to the chained array combine."""
    km = _km(spark, [("k", "a1")], [("k", "b1")])
    arr = BlockManager.from_dict(spark, {"k": (["a2"], ["b2"]), "m": (["a3"], ["b3"])})
    out = BlockManager.combine_all([km, arr])
    assert blocks_as_dict(out) == {
        "k": ({"a1", "a2"}, {"b1", "b2"}),
        "m": ({"a3"}, {"b3"}),
    }
    # pure array-layout input works too
    out2 = BlockManager.combine_all([arr, BlockManager.from_dict(spark, {"m": (["a4"], [])})])
    assert blocks_as_dict(out2)["m"] == ({"a3", "a4"}, {"b3"})


def test_combine_name_mismatch_raises(spark):
    """ADVICE r9: combine_all merges sides by name, not position — a
    swapped-orientation manager must raise, not silently cross sides."""
    bm1 = _km(spark, [("k", "a1")], [("k", "b1")])
    bm2 = BlockManager.from_key_assignments(
        bm1.right_keys, bm1.left_keys, "B", "A", assume_distinct=True
    )
    with pytest.raises(ValueError, match="left_name"):
        BlockManager.combine_all([bm1, bm2])
    with pytest.raises(ValueError, match="left_name"):
        bm1.combine(bm2)
    with pytest.raises(ValueError, match="left_name"):
        BlockManager(bm1.df, "A", "B").combine(BlockManager(bm2.df, "B", "A"))


def test_covered_ids_unknown_side_raises(spark):
    """ADVICE r9: a typo'd side must error, not silently return the
    right frame (wrong anti-join results)."""
    bm = _km(spark, [("k", "a1")], [("k", "b1")])
    with pytest.raises(ValueError, match="unknown side"):
        bm.covered_ids("nope")
    with pytest.raises(ValueError, match="unknown side"):
        BlockManager(bm.df, "A", "B").covered_ids("nope")


def test_block_pairs_explicit_expand_partitions_wins(spark):
    """ADVICE r9: an explicitly passed expand_partitions must be
    honored even on a combine()-produced (keys_partitioned) manager —
    combining two low-cardinality managers reintroduces the single-task
    expansion hazard the repartition guards against."""
    bm = _km(spark, [("k", "a1"), ("k", "a2")], [("k", "b1")]).combine(
        _km(spark, [("k", "a3")], [("k", "b2")])
    )
    assert bm.keys_partitioned
    explicit = bm.block_pairs(expand_partitions=7)._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning(7)" in explicit
    default = bm.block_pairs()._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning" not in default


def test_combine_all_cache_registered_for_release(spark):
    """ADVICE r9: combine_all's eager stacked cache is tracked and
    freed by the next harness-level release_all — no orphan cache
    accumulation across a long session of combines."""
    from klinker_spark import ckpt

    ckpt.release_all(spark)
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    bm = _km(spark, [("k", "a1")], [("k", "b1")]).combine(
        _km(spark, [("k", "a2")], [("k", "b2")])
    )
    assert len(ckpt._TRACKED) >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() > before
    # the cache is alive for the manager's terminal action …
    assert {tuple(r) for r in bm.pairs().collect()} == {
        ("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"),
    }
    # … and released wholesale at the next harness boundary
    ckpt.release_all(spark)
    assert ckpt._TRACKED == []
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0


def test_release_caches_per_manager(spark):
    """ADVICE r10: a long-lived library consumer must be able to free
    one dead manager's caches without the harness-wide release_all —
    release_caches unpersists exactly that manager's tracked frames
    and leaves other managers' caches alive."""
    from klinker_spark import ckpt

    ckpt.release_all(spark)
    bm1 = _km(spark, [("k", "a1")], [("k", "b1")]).combine(
        _km(spark, [("k", "a2")], [("k", "b2")])
    )
    bm2 = _km(spark, [("j", "a9")], [("j", "b9")]).persisted()
    n_tracked = len(ckpt._TRACKED)
    assert n_tracked >= 3  # bm1's stacked spine + bm2's two key frames
    bm1.pairs().collect()
    bm1.release_caches()
    # bm1's cache gone, bm2's still registered and usable
    assert len(ckpt._TRACKED) == n_tracked - 1
    assert {tuple(r) for r in bm2.pairs().collect()} == {("a9", "b9")}
    bm1.release_caches()  # idempotent
    assert len(ckpt._TRACKED) == n_tracked - 1
    bm2.release_caches()
    assert len(ckpt._TRACKED) == n_tracked - 3
    ckpt.release_all(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
