"""Z-order layout (ops/layout.py) — Morton-code math on fixed points,
pruning-envelope narrowness, degenerate dims, and plan shape."""

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops.layout import zorder_bin_stats, zorder_key_col


def _key(spark, x, y, xmax, ymax, bits):
    df = spark.createDataFrame([(x, y)], "x long, y long").select(
        zorder_key_col(
            F.col("x"), F.col("y"),
            F.lit(0), F.lit(xmax), F.lit(0), F.lit(ymax), bits=bits,
        ).alias("z")
    )
    return df.collect()[0].z


def test_morton_interleave_known_values(spark):
    # bounds 0..3 with bits=2: scale is identity on {0..3}
    # x bits land at odd positions, y bits at even
    assert _key(spark, 0, 0, 3, 3, 2) == 0
    assert _key(spark, 1, 0, 3, 3, 2) == 2      # x bit0 -> pos 1
    assert _key(spark, 0, 1, 3, 3, 2) == 1      # y bit0 -> pos 0
    assert _key(spark, 3, 1, 3, 3, 2) == 0b1011  # x=11 -> pos1,3; y=01 -> pos0
    assert _key(spark, 3, 3, 3, 3, 2) == 15


def test_zorder_locality_orders_quadrants(spark):
    # the four quadrant corners of a 0..3 grid sort into Z traversal:
    # (0,0) < (1,1)-quadrant reps … low keys share high-bit prefixes
    ks = [_key(spark, x, y, 3, 3, 2) for x, y in [(0, 0), (1, 1), (2, 2), (3, 3)]]
    assert ks == sorted(ks) and len(set(ks)) == 4


def test_bin_stats_envelope_is_narrow(spark):
    # 64x64 integer grid; 6+6 bits, top-6 bins -> each bin must cover a
    # bounded slice of BOTH dims, far narrower than the global range
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    stats = zorder_bin_stats(df, "x", "y", bits=6, bin_bits=6).collect()
    assert sum(r.n_rows for r in stats) == 64 * 64
    assert len(stats) == 64
    for r in stats:
        # top-6 of 12 bits fixes 3 high bits of each dim -> 8-wide boxes
        assert r.max_x - r.min_x <= 7
        assert r.max_y - r.min_y <= 7


def test_constant_dimension_degenerates_to_zero(spark):
    df = spark.createDataFrame([(5, i) for i in range(8)], "x long, y long")
    stats = zorder_bin_stats(df, "x", "y", bits=4, bin_bits=2).collect()
    assert sum(r.n_rows for r in stats) == 8
    assert all(r.min_x == 5 and r.max_x == 5 for r in stats)


def test_zorder_plan_no_udf_single_broadcast(spark):
    df = spark.createDataFrame([(1, 2), (3, 4)], "x long, y long")
    plan = (
        zorder_bin_stats(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_zordered_write_prunes_both_dims(spark, tmp_path):
    # the production path: range-partition by zkey, write, then check
    # every file's footer-level min/max box is narrow in BOTH dims
    import pyarrow.parquet as pq
    import glob

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    bounds = df.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    z = zorder_key_col(
        F.col("x"), F.col("y"),
        F.col("xmin"), F.col("xmax"), F.col("ymin"), F.col("ymax"), bits=5,
    )
    out = str(tmp_path / "zpq")
    (
        df.crossJoin(F.broadcast(bounds))
        .select("x", "y", z.alias("zkey"))
        .repartitionByRange(16, "zkey")
        .sortWithinPartitions("zkey")
        .write.parquet(out)
    )
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 8
    for f in files:
        md = pq.read_metadata(f)
        xs, ys = [], []
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in ("x", "y") and col.statistics is not None:
                    (xs if name == "x" else ys).append(
                        (col.statistics.min, col.statistics.max)
                    )
        # each file covers at most half the global span on each dim
        assert max(b for _, b in xs) - min(a for a, _ in xs) <= 16
        assert max(b for _, b in ys) - min(a for a, _ in ys) <= 16


def test_compact_small_files(spark, tmp_path):
    """20 tiny files -> 1 planned file, identical row multiset; ordered
    mode narrows per-file footer ranges."""
    from klinker_spark.ops.layout import compact_small_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(2000).selectExpr("id", "id % 7 AS grp")
    df.repartition(20).write.parquet(src)
    stats = compact_small_files(spark, src, dst, target_bytes=1 << 30)
    assert stats["n_files_in"] == 20
    assert stats["n_out_planned"] == 1 and stats["n_files_out"] == 1
    got = spark.read.parquet(dst)
    assert got.count() == 2000
    assert got.agg(F.sum("id")).first()[0] == sum(range(2000))

    # ordered compaction: each output file covers a disjoint id range
    dst2 = str(tmp_path / "ordered")
    stats2 = compact_small_files(
        spark, src, dst2, target_bytes=8 << 10, order_by=["id"]
    )
    assert stats2["n_out_planned"] > 1
    import duckdb

    ranges = duckdb.connect().execute(
        f"SELECT min(id), max(id) FROM read_parquet('{dst2}/*.parquet', "
        "filename=true) GROUP BY filename ORDER BY 1"
    ).fetchall()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint, prunable ranges
