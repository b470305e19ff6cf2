"""End-to-end domain curation chains (maths.py / mix.py shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_thoughts_spark.pipeline.curation import (
    DomainConfig,
    curate_domain,
    verify_and_mix,
)


def _math_domain(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"solve the equation number {i} for x given constants a and b", "good_src"))
    rows.append((100, "solve the equation number 7 for x given constants a and b", "good_src"))  # near-dup of 7
    rows.append((101, "please draw a diagram of the triangle construction", "good_src"))
    rows.append((102, "some problem from a bad source entirely", "bad_src"))
    return spark.createDataFrame(rows, "pid int, problem string, src string")


def test_curate_domain_chain(spark):
    df = _math_domain(spark)
    eval_set = spark.createDataFrame(
        [("solve the equation number 3 for x given constants a and b",)], "problem string"
    )
    cfg = DomainConfig(
        name="math",
        id_col="pid",
        text_col="problem",
        source_col="src",
        keep_sources=["good_src"],
        problem_filter=lambda d: d.filter(~F.col("problem").rlike("(?i)\\b(diagram|figure)\\b")),
        dedup_jaccard=0.8,
        decontaminate_ngram=8,  # the test problems are 11 words; 13-grams need >=13
    )
    out = curate_domain(df, cfg, eval_sets=[eval_set])
    ids = sorted(r["pid"] for r in out.select("pid").collect())
    assert 102 not in ids  # source filter
    assert 101 not in ids  # problem filter (diagram)
    assert 100 not in ids  # fuzzy dedup kept min id 7
    assert 3 not in ids  # decontaminated vs eval set (8-gram overlap)
    assert 7 in ids and len(ids) == 39  # 40 base problems minus decontaminated #3
    row = out.filter(F.col("pid") == 7).collect()[0]
    assert row["domain"] == "math"
    assert row["reasoning"].startswith("[mock:")


def test_verify_and_mix(spark):
    math = spark.createDataFrame(
        [("m1", "What is 2+2?", "4", "4"), ("m2", "What is 3+3?", "7", "6")],
        "qid string, instruction string, answer string, truth string",
    )
    code = spark.createDataFrame(
        [("c1", "Reverse a list", "ok", "ok")],
        "qid string, instruction string, answer string, truth string",
    )
    mixes = verify_and_mix(
        {"math": math, "code": code},
        answer_col="answer",
        truth_col="truth",
        instruction_col="instruction",
        response_col="answer",
        id_col="qid",
    )
    v = {r["qid"]: r for r in mixes["verified"].collect()}
    u = {r["qid"]: r for r in mixes["unverified"].collect()}
    assert set(v) == {"m1", "c1"}  # m2 judged wrong
    assert set(u) == {"m1", "m2", "c1"}
    conv = v["m1"]["conversations"]
    assert [t["from"] for t in conv] == ["human", "gpt"]
    assert conv[0]["value"] == "What is 2+2?"
    assert v["m1"]["domain"] == "math"


def test_curate_science_chain(spark):
    from open_thoughts_spark.pipeline.curation import curate_science

    def camel(subject, n):
        rows = [
            (
                i,
                f"explain {subject} phenomenon number {i} in rigorous detail please",
                f"{subject}-topic",
                f"sub{i % 3}",
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "cid int, message_1 string, `topic;` string, sub_topic string"
        )

    out = curate_science(
        {"biology": camel("biology", 9), "physics": camel("physics", 6)},
        id_col="cid",
        samples_per_subtopic=2,
    )
    rows = out.collect()
    # 2 per sub_topic x 3 subtopics x 2 subjects
    assert len(rows) == 12
    assert set(out.columns) >= {
        "cid", "question", "domain", "topic", "sub_topic", "source", "reasoning"
    }
    assert {r["domain"] for r in rows} == {"biology", "physics"}
    assert {r["source"] for r in rows} == {"camel"}
    assert all(r["question"].startswith("explain ") for r in rows)
    # deterministic: same input → same sample
    again = curate_science(
        {"biology": camel("biology", 9), "physics": camel("physics", 6)},
        id_col="cid", samples_per_subtopic=2,
    )
    assert sorted(r["cid"] for r in rows) == sorted(
        r["cid"] for r in again.collect()
    )
    import pytest as _p

    with _p.raises(ValueError, match="unknown science subject"):
        curate_science({"alchemy": camel("biology", 3)}, id_col="cid")


def test_curate_puzzle_chain(spark):
    from open_thoughts_spark.pipeline.curation import (
        curate_puzzle,
        riddle_sense_format,
    )

    rows = [
        (
            i,
            f"what has keys but cannot open locks number {i}",
            (["A", "B"], [f"piano {i}", f"map {i}"]),
            "A",
        )
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "rid int, question string, "
        "choices struct<label: array<string>, text: array<string>>, "
        "answerKey string",
    )
    fmt = riddle_sense_format(df).filter(F.col("rid") == 2).collect()[0]
    assert fmt["question"] == (
        "what has keys but cannot open locks number 2\nA: piano 2\nB: map 2"
    )
    assert fmt["answer"] == "A"
    out = curate_puzzle(df, id_col="rid", take=5)
    got = out.collect()
    assert len(got) == 5
    assert {r["domain"] for r in got} == {"puzzle"}
    assert {r["source"] for r in got} == {"riddle_sense"}
    assert all("\nA: " in r["question"] for r in got)
    assert all(r["reasoning"].startswith("[mock:") for r in got)


def test_curate_code_end_to_end(spark):
    """Heuristic filter -> dedup -> decontaminate -> sandboxed execution
    judge, composed (open_thoughts/code/ chain). Rows survive only by
    passing EVERY stage — including actually executing their code."""
    import json

    from open_thoughts_spark.pipeline.curation import curate_code

    good_desc = (
        "Write a program that doubles an integer read from stdin. " * 5
    )
    eval_desc = (
        "This exact problem statement appears in the eval benchmark set "
        "and must therefore be decontaminated away from the pool. " * 4
    )
    ok_code = "```python\nimport sys\nprint(int(sys.stdin.read()) * 2)\n```"
    bad_code = "```python\nimport sys\nprint(int(sys.stdin.read()) * 3)\n```"
    t = json.dumps({"inputs": ["21"], "outputs": ["42"]})
    rows = [
        # survives everything
        (1, good_desc, t, '["s"]', ok_code),
        # near-duplicate description of 1 -> minhash dedup keeps min id
        (2, good_desc + " again", t, '["s"]', ok_code),
        # fails the heuristic cascade (short description)
        (3, "too short", t, '["s"]', ok_code),
        # decontaminated (shares 13-grams with the eval set)
        (4, eval_desc, t, '["s"]', ok_code),
        # passes heuristics but the code is WRONG -> judge rejects
        (5, "Another long and different description about summing numbers "
            "carefully written to pass all the heuristic length checks. " * 3,
         t, '["s"]', bad_code),
    ]
    df = spark.createDataFrame(
        rows,
        "pid long, description string, tests string, solutions string,"
        " response string",
    )
    ev = spark.createDataFrame([(eval_desc,)], "text string")
    kept = curate_code(
        df, "pid", eval_sets=[ev], judge_timeout_s=5.0
    ).select("pid").collect()
    assert [r["pid"] for r in kept] == [1]
