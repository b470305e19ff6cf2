"""Completions harness + small relational additions."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from open_thoughts_spark.operators import relational
from open_thoughts_spark.operators.completions import (
    CompletionMap,
    completions,
    mock_backend,
)


def test_completions_mock_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "what is 2+2"), (2, "what is 3+3")], "id int, text string"
    )
    cmap = CompletionMap(
        name="qa",
        build_prompt=lambda s: "Answer briefly: " + s,
        parse_response=lambda s: s.str.upper(),
    )
    out1 = {r["id"]: r["completion"] for r in completions(df, cmap).collect()}
    out2 = {r["id"]: r["completion"] for r in completions(df.repartition(3), cmap).collect()}
    assert out1 == out2
    assert out1[1].startswith("[MOCK:") and out1[1] != out1[2]


def test_completions_custom_backend(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, text string")

    def echo_backend(prompts: pd.Series) -> pd.Series:
        return "echo:" + prompts

    cmap = CompletionMap("echo", lambda s: s, lambda s: s)
    out = {r["id"]: r["completion"] for r in completions(df, cmap, backend=echo_backend).collect()}
    assert out == {1: "echo:x", 2: "echo:y"}


def test_choose_range_and_upsample(spark):
    df = spark.range(10)
    sl = relational.choose_range(df, 3, 7, ["id"])
    assert sorted(r["id"] for r in sl.collect()) == [3, 4, 5, 6]

    up = relational.upsample_to(df, 25, ["id"])
    assert up.count() == 25
    counts = {r["id"]: r["n"] for r in up.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert counts[0] == 3 and counts[9] == 2  # 2 full cycles + head of 5


def test_list_index_helpers(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c"]), (2, [])], "id int, xs array<string>")
    out = relational.extract_list_index(df, "xs", 1, "second")
    got = {r["id"]: r["second"] for r in out.collect()}
    assert got == {1: "b", 2: None}
    first = relational.list_to_string(df, "xs", "first")
    assert {r["id"]: r["first"] for r in first.collect()} == {1: "a", 2: None}
