"""Remaining relational/commons coverage: renames, string ops, membership
annotation, truthy filters, group-count HAVING."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_thoughts_spark.operators import relational


def test_force_rename_clobbers(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id int, x string, y string")
    out = relational.force_rename_columns(df, {"x": "y"})
    assert out.columns == ["id", "y"]
    assert out.collect()[0]["y"] == "a"


def test_strip_and_concat_columns(spark):
    df = spark.createDataFrame([("  hi  ", "there")], "a string, b string")
    out = relational.strip_column(df, "a")
    assert out.collect()[0]["a"] == "hi"
    cc = relational.concatenate_columns(out, ["a", "b"], "joined", start="<", sep=" ", end=">")
    assert cc.collect()[0]["joined"] == "<hi there>"


def test_filter_truthy_and_select_rows(spark):
    df = spark.createDataFrame(
        [(1, True, "x"), (2, False, "x"), (3, True, "y")], "id int, ok boolean, k string"
    )
    assert relational.filter_truthy(df, "ok").count() == 2
    assert relational.filter_truthy(df, "ok", keep_truthy=False).count() == 1
    assert relational.select_rows(df, {"ok": True, "k": "x"}).count() == 1
    assert relational.select_rows_regex(df, "k", "^y$").count() == 1
    assert relational.filter_by_values(df, "k", include=["y"]).count() == 1
    assert relational.filter_by_values(df, "k", exclude=["y"]).count() == 2


def test_annotate_membership_broadcast(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, dom string")
    dim = spark.createDataFrame([("a",), ("c",)], "dom string")
    out = relational.annotate_membership(df, dim, "dom", "is_edu")
    got = {r["id"]: r["is_edu"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_count_and_filter_low_frequency(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1, "dom string"
    )
    out = relational.count_and_filter_low_frequency(df, "dom", 2)
    got = {r["dom"]: r["count"] for r in out.collect()}
    assert got == {"a": 5, "b": 2}


def test_shard_and_group_by_partition(spark):
    df = spark.range(100).withColumn("k", (F.col("id") % 5).cast("string"))
    assert relational.shard(df, 7).rdd.getNumPartitions() == 7
    grouped = relational.group_by_partition(df, ["k"], 5)
    # co-location: every key lives in exactly one partition
    spread = (
        grouped.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("nparts"))
    )
    assert spread.filter(F.col("nparts") != 1).count() == 0


def test_add_row_ids_scalable_matches_global_window(spark):
    from open_thoughts_spark.operators import relational

    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("v")
    )
    a = {r["k"]: r["row_id"]
         for r in relational.add_row_ids(df, ["k"]).collect()}
    b = {r["k"]: r["row_id"]
         for r in relational.add_row_ids_scalable(df, ["k"], num_partitions=8).collect()}
    assert a == b
    assert sorted(b.values()) == list(range(1, 5001))  # dense 1..N
