"""Bloom-filter ingestion gate: no false negatives ever, literal and
broadcast-bitmap paths agree bit-for-bit, NULL keys are never members,
and membership probing stays a zero-shuffle projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from klinker_spark.ops import bloom as bloom_mod
from klinker_spark.ops.bloom import bloom_build, bloom_contains, bloom_ingest_gate


def _keys(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["k"])


def test_bloom_no_false_negatives(spark):
    members = [f"key{i}" for i in range(200)]
    bloom = bloom_build(_keys(spark, members), "k")
    out = bloom_contains(_keys(spark, members), "k", bloom)
    assert all(r["maybe_member"] for r in out.collect())


def test_bloom_rejects_most_absent_keys(spark):
    members = [f"key{i}" for i in range(100)]
    absent = [f"other{i}" for i in range(200)]
    bloom = bloom_build(_keys(spark, members), "k", m_bits=1 << 16)
    out = bloom_contains(_keys(spark, absent), "k", bloom, m_bits=1 << 16)
    hits = sum(1 for r in out.collect() if r["maybe_member"])
    # 100 keys * 4 hashes in 65536 bits: FP rate << 1%
    assert hits <= 2


def test_bloom_null_key_is_not_member(spark):
    bloom = bloom_build(_keys(spark, ["a"]), "k")
    df = spark.createDataFrame([("a",), (None,)], ["k"])
    out = {r["k"]: r["maybe_member"] for r in bloom_contains(df, "k", bloom).collect()}
    assert out["a"] is True and out[None] is False


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_bloom_build_bounded_words(spark, hash_fn):
    m = 1 << 10
    bloom = bloom_build(_keys(spark, [f"x{i}" for i in range(500)]), "k", m_bits=m, hash_fn=hash_fn)
    rows = bloom.collect()
    assert len(rows) <= m // bloom_mod.WORD_BITS
    assert all(0 <= r["word_idx"] < m // bloom_mod.WORD_BITS for r in rows)


def test_bloom_literal_vs_broadcast_parity(spark, monkeypatch):
    members = [f"key{i}" for i in range(80)]
    probes = members[:40] + [f"nope{i}" for i in range(120)]
    bloom = bloom_build(_keys(spark, members), "k")
    lit = {
        r["k"]: r["maybe_member"]
        for r in bloom_contains(_keys(spark, probes), "k", bloom).collect()
    }
    monkeypatch.setattr(bloom_mod, "BLOOM_LITERAL_MAX_WORDS", 1)
    bc = {
        r["k"]: r["maybe_member"]
        for r in bloom_contains(_keys(spark, probes), "k", bloom).collect()
    }
    assert lit == bc


def test_bloom_gate_splits_new_from_maybe_dup(spark):
    hist = _keys(spark, [f"seen{i}" for i in range(50)])
    bloom = bloom_build(hist, "k")
    inc = _keys(spark, ["seen0", "seen49", "fresh1", "fresh2"])
    out = {r["k"]: r["maybe_dup"] for r in bloom_ingest_gate(inc, bloom, key_col="k").collect()}
    assert out["seen0"] and out["seen49"]
    # definitely-new rows pass (false positives possible but wildly
    # unlikely at this load factor)
    assert not out["fresh1"] and not out["fresh2"]


def test_bloom_contains_plan_is_projection_only(spark):
    from tests.test_plans import plan_of

    bloom = bloom_build(_keys(spark, ["a", "b"]), "k")
    out = bloom_contains(_keys(spark, ["a", "c"]), "k", bloom)
    plan = plan_of(out)
    for bad in ("Exchange", "Join", "MapInPandas", "BatchEvalPython"):
        assert bad not in plan, f"unexpected {bad} in bloom_contains plan"


def test_bloom_gate_runs_on_streams(spark, tmp_path):
    """The literal-bitmap gate is a pure projection, so the SAME
    operator code gates a Structured Stream unchanged — the streaming
    ingestion pattern: refresh the bitmap per foreachBatch or per
    restart, probe map-side with zero stream-side shuffle."""
    hist = _keys(spark, [f"seen{i}" for i in range(30)])
    bloom = bloom_build(hist, "k")
    inc = _keys(spark, ["seen3", "fresh_a", "seen7", "fresh_b"])
    src = str(tmp_path / "inc")
    inc.write.parquet(src)
    stream = spark.readStream.schema(inc.schema).parquet(src)
    q = (
        bloom_ingest_gate(stream, bloom, key_col="k")
        .writeStream.format("memory")
        .queryName("bloom_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(map(tuple, spark.sql("select * from bloom_stream").collect()))
    want = sorted(map(tuple, bloom_ingest_gate(inc, bloom, key_col="k").collect()))
    assert got == want
