"""Format-converter round-trips on tiny conversations."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_thoughts_spark.operators import conversations as C

LONG_ROWS = [
    ("c1", 0, "system", "You are helpful."),
    ("c1", 1, "user", "Hi there"),
    ("c1", 2, "assistant", "Hello!"),
    ("c2", 0, "user", "What is Spark?"),
    ("c2", 1, "assistant", "A distributed engine."),
    ("c2", 2, "user", "Thanks"),
    ("c2", 3, "assistant", "Anytime."),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _long(spark):
    # shuffle physical order to prove order comes from turn_idx, not layout
    return spark.createDataFrame(LONG_ROWS[::-1], SCHEMA).repartition(4)


def test_long_sharegpt_roundtrip(spark):
    df = _long(spark)
    nested = C.long_to_sharegpt(df)
    row = {r["conv_id"]: r["conversations"] for r in nested.collect()}
    assert [t["from"] for t in row["c1"]] == ["system", "human", "gpt"]
    assert [t["value"] for t in row["c2"]][:2] == ["What is Spark?", "A distributed engine."]

    back = C.sharegpt_to_long(nested)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"]) for r in back.collect()
    )
    assert got == sorted(LONG_ROWS)


def test_long_openai_roundtrip(spark):
    df = _long(spark)
    nested = C.long_to_openai(df)
    back = C.openai_to_long(nested)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"]) for r in back.collect()
    )
    assert got == sorted(LONG_ROWS)


def test_change_tags(spark):
    df = _long(spark)
    out = C.change_tags(df, "role", {"user": "human", "assistant": "gpt"})
    roles = {r["role"] for r in out.collect()}
    assert roles == {"system", "human", "gpt"}


def test_instruction_response_conversions(spark):
    pairs = spark.createDataFrame(
        [("p1", "Do X", "Done X"), ("p2", "Do Y", "Done Y")],
        "conv_id string, inst string, resp string",
    )
    long = C.instruction_response_to_long(pairs, "inst", "resp", "conv_id", system_prompt="Be terse.")
    assert long.count() == 6
    first = {(r["conv_id"], r["turn_idx"]): (r["role"], r["text"]) for r in long.collect()}
    assert first[("p1", 0)] == ("system", "Be terse.")
    assert first[("p1", 1)] == ("user", "Do X")
    assert first[("p1", 2)] == ("assistant", "Done X")

    back = C.long_to_instruction_response(long)
    got = {r["conv_id"]: (r["instruction"], r["response"]) for r in back.collect()}
    assert got == {"p1": ("Do X", "Done X"), "p2": ("Do Y", "Done Y")}


def test_concatenate_turns(spark):
    df = _long(spark)
    out = C.concatenate_turns(df, sep=" | ")
    got = {r["conv_id"]: r["full_text"] for r in out.collect()}
    assert got["c1"] == "system: You are helpful. | user: Hi there | assistant: Hello!"
