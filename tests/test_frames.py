"""Frame semantics: melt, concat_values (NULL handling + dedup),
RDF-datatype clean, reverse_rel — reference
``tests/test_klinkerframe.py:20-50`` adapted to the engine's sorted-set
concat semantics (SURVEY §4 delta 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from klinker_spark.data.frames import (
    EntityFrame,
    clean_rdf_datatype,
    melt,
    reverse_rel,
)


def test_melt_drops_nulls(table_a):
    attrs = melt(table_a, "id")
    # a4 has NULL Occupation -> 4 rows instead of 5... (4 attrs per row)
    by_id = attrs.groupBy("id").count().collect()
    counts = {r["id"]: r["count"] for r in by_id}
    assert counts == {"a1": 4, "a2": 4, "a3": 4, "a4": 3, "a5": 4}


def test_concat_values_sorted_set(frame_a):
    got = {r["id"]: r["text"] for r in frame_a.concat_values().collect()}
    # NULL elided (a4); values sorted lexicographically (engine semantics)
    assert got["a4"] == "14-03-1990 India Nushi Devi"
    assert got["a1"] == "11-12-1973 Engineer John McExample USA"


def test_concat_values_dedup(spark):
    df = spark.createDataFrame(
        [("e1", "p1", "x"), ("e1", "p2", "x"), ("e1", "p3", "y")],
        ["head", "rel", "tail"],
    )
    ef = EntityFrame.from_triples(df, "T")
    got = {r["id"]: r["text"] for r in ef.concat_values().collect()}
    assert got == {"e1": "x y"}
    got_dup = {r["id"]: r["text"] for r in ef.concat_values(remove_duplicates=False).collect()}
    assert got_dup == {"e1": "x x y"}


def test_clean_rdf_datatype(spark):
    df = spark.createDataFrame([("5^^<xsd:integer>",), ("plain",)], ["value"])
    got = [r[0] for r in df.select(clean_rdf_datatype("value")).collect()]
    assert got == ["5", "plain"]


def test_reverse_rel(spark):
    rels = spark.createDataFrame([("h1", "knows", "t1")], ["head", "rel", "tail"])
    got = reverse_rel(rels).collect()[0]
    assert (got["head"], got["rel"], got["tail"]) == ("t1", "_inv_knows", "h1")


def test_from_triples_clean(spark):
    df = spark.createDataFrame(
        [("e1", "age", "5^^<xsd:integer>")], ["head", "rel", "tail"]
    )
    ef = EntityFrame.from_triples(df, "T", clean=True)
    assert ef.attrs.collect()[0]["value"] == "5"


def test_ids(frame_a):
    assert {r["id"] for r in frame_a.ids().collect()} == {"a1", "a2", "a3", "a4", "a5"}


def test_local_df_arrow_path(spark):
    from klinker_spark.session import _split_ddl, local_df

    # nested-type-safe DDL split
    assert _split_ddl("a int, b array<struct<x:int,y:double>>, c string") == [
        "a int",
        "b array<struct<x:int,y:double>>",
        "c string",
    ]
    df = local_df(
        spark, [(1, [0.5, 1.5], "x"), (2, [2.5], "y")], "cid int, cv array<double>, s string"
    )
    assert df.schema.simpleString() == "struct<cid:int,cv:array<double>,s:string>"
    assert df.count() == 2
    assert local_df(spark, [], "a bigint, b string").count() == 0


def test_dataset_read_csv(spark, tmp_path):
    # format-agnostic S1 loader: triple tables from csv, same Dataset
    from klinker_spark.data.dataset import Dataset

    left = tmp_path / "left_csv"
    right = tmp_path / "right_csv"
    spark.createDataFrame(
        [("a1", "name", "rebecca"), ("a2", "name", "max")], ["head", "rel", "tail"]
    ).write.option("header", "true").csv(str(left))
    spark.createDataFrame(
        [("b1", "name", "rebecca")], ["head", "rel", "tail"]
    ).write.option("header", "true").csv(str(right))
    ds = Dataset.read(spark, str(left), str(right), fmt="csv")
    assert {r["id"] for r in ds.left.ids().collect()} == {"a1", "a2"}
    assert ds.right.attrs.collect()[0]["value"] == "rebecca"


def test_dataset_read_orc(spark, tmp_path):
    # ORC is Spark-native: same Dataset loader, columnar pushdown intact
    from klinker_spark.data.dataset import Dataset

    left = tmp_path / "left_orc"
    right = tmp_path / "right_orc"
    spark.createDataFrame(
        [("a1", "name", "rebecca"), ("a2", "name", "max")], ["head", "rel", "tail"]
    ).write.orc(str(left))
    spark.createDataFrame(
        [("b1", "name", "rebecca")], ["head", "rel", "tail"]
    ).write.orc(str(right))
    ds = Dataset.read(spark, str(left), str(right), fmt="orc")
    assert {r["id"] for r in ds.left.ids().collect()} == {"a1", "a2"}
    assert ds.right.attrs.collect()[0]["value"] == "rebecca"
