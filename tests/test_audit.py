"""Data-quality / versioning audit operators."""

from __future__ import annotations

from klinker_spark.ops.audit import column_profile, fk_violations, snapshot_diff


def test_fk_violations_counts(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = fk_violations(child, "fk", parent, "pk", "c->p").collect()[0]
    assert (row["relation"], row["n_rows"], row["n_null_key"], row["n_orphans"]) == (
        "c->p", 4, 1, 1,
    )
    assert row["violation_ppm"] == 500000


def test_column_profile_long_format(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None)], "id long, v string"
    )
    got = {r["column"]: r for r in column_profile(df).collect()}
    assert got["id"]["n_rows"] == 3 and got["id"]["n_distinct"] == 3
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 1
    assert got["v"]["min_value"] == "a" and got["id"]["max_value"] == "3"


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "y"), (3, "Z"), (4, "w")], "doc_id long, text string"
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "doc_id", ["text"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "modified", 4: "added"}


def test_snapshot_diff_null_not_concat_ambiguous(spark):
    """(a, null) must differ from (anull-ish concatenations)."""
    old = spark.createDataFrame([(1, "a", None)], "doc_id long, x string, y string")
    new = spark.createDataFrame([(1, "a", "")], "doc_id long, x string, y string")
    got = snapshot_diff(old, new, "doc_id", ["x", "y"]).collect()
    assert got[0]["status"] == "modified"
