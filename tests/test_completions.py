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


# --- round-3 map tranche ---

def test_alpaca_map_parse_filters(spark):
    from open_thoughts_spark.operators.maps import (
        MAPS, alpaca_expand, apply_map,
    )

    df = spark.createDataFrame(
        [(1, "Generate 10 diverse task instructions. 1. Instruction: seed")],
        "sid int, alpaca_prompt string",
    )
    out = alpaca_expand(apply_map(df, MAPS["alpaca"]))
    rows = out.collect()
    # mock emits 2 valid + 1 blacklisted ('picture'/'diagram') + 1 malformed
    assert len(rows) == 2
    insts = {r["instruction"].split()[0] for r in rows}
    assert insts == {"Compose", "Summarize"}
    # <noinput> normalized to empty; real input preserved
    by_first = {r["instruction"].split()[0]: r for r in rows}
    assert by_first["Compose"]["input"] == ""
    assert by_first["Summarize"]["input"].startswith("The passage")


def test_alpaca_seed_expand_keeps_both(spark):
    from open_thoughts_spark.operators.maps import (
        MAPS, alpaca_seed_expand, apply_map,
    )

    df = spark.createDataFrame(
        [(1, "make a task", "orig-inst", "orig-in", "orig-out")],
        "sid int, seed_prompt string, instruction string, "
        "input string, output string",
    )
    out = alpaca_seed_expand(apply_map(df, MAPS["alpaca_seed"]))
    rows = sorted(out.collect(), key=lambda r: r["instruction"])
    assert len(rows) == 2  # generated row + original row
    assert rows[0]["instruction"].startswith("Explain the concept")
    assert rows[1]["instruction"] == "orig-inst"


def test_generator_scorer_testcases_unnatural(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    gen = apply_map(
        spark.createDataFrame([(1, "list three fruits")],
                              "rid int, request string"),
        MAPS["generator"],
    ).collect()[0]
    assert isinstance(gen["generated"], list) and len(gen["generated"]) >= 1

    sc = apply_map(
        spark.createDataFrame([(1, "q", "resp")],
                              "rid int, query string, response string"),
        MAPS["scorer"],
    ).collect()[0]
    assert 1 <= sc["score"] <= 100
    assert sc["classifier_reasoning"].startswith("scored")

    tc = apply_map(
        spark.createDataFrame([(1, "sum two ints from stdin")],
                              "rid int, problem string"),
        MAPS["test_cases"],
    ).collect()[0]
    assert len(tc["test_inputs"]) == len(tc["test_outputs"]) >= 2

    un = apply_map(
        spark.createDataFrame([(1, "seed")], "rid int, seed_prompt string"),
        MAPS["unnatural_instructions"],
    ).collect()[0]
    assert un["instruction"].startswith("Classify")
    assert un["constraints"].startswith("The output")


def test_url_classify_and_ocr_and_extract_qa(spark):
    from open_thoughts_spark.operators.maps import (
        MAPS, apply_map, extract_qa_expand,
    )

    urls = apply_map(
        spark.createDataFrame(
            [(1, "mathacademy.example.org"), (2, "shopping.example.com")],
            "uid int, url string",
        ),
        MAPS["url_classify"],
    ).collect()
    got = {r["uid"]: r["url_classification"] for r in urls}
    assert got == {1: True, 2: False}
    assert all(r["url_classification_full"].split()[-1] in ("yes", "no")
               for r in urls)

    ocr = apply_map(
        spark.createDataFrame([(1, bytearray(b"%PDF-fake"), 3)],
                              "did int, page_bytes binary, page_number int"),
        MAPS["gemini_ocr"],
    ).collect()[0]
    assert ocr["output_extraction"].startswith("# Extracted text")

    qa = extract_qa_expand(
        apply_map(
            spark.createDataFrame(
                [
                    (1, "intro\nQ: what is two plus two?\nA: four\n"
                        "noise\nQ: capital of france?\nA: paris"),
                    (2, "just an advertisement, no questions at all"),
                ],
                "did int, text string",
            ),
            MAPS["webinstruct_extract_qa"],
        )
    ).collect()
    assert len(qa) == 2  # doc 2 vanishes (qa_exists false)
    assert {r["question"] for r in qa} == {
        "what is two plus two?", "capital of france?"
    }
    assert {r["answer"] for r in qa} == {"four", "paris"}


def test_auto_evol_trio_roundtrip(spark):
    import json as _json

    from open_thoughts_spark.operators.maps import MAPS, apply_map

    base = spark.createDataFrame(
        [(1, "Evolve by adding constraints.", "Solve x + 2 = 5.")],
        "eid int, evol_prompt string, instruction string",
    )
    evolved = apply_map(base, MAPS["auto_evol_llm"]).collect()[0]
    assert evolved["evolved_instruction"].startswith("Solve x + 2 = 5.")
    assert len(evolved["evolved_instruction"]) > len("Solve x + 2 = 5.")
    assert evolved["methods_list"]

    # trajectory analysis flags a stage that regressed in complexity
    traj = apply_map(
        spark.createDataFrame(
            [
                (1, _json.dumps(["short", "a longer instruction", "tiny"])),
                (2, _json.dumps(["a", "ab", "abc"])),
            ],
            "eid int, evolved_instructions_json string",
        ),
        MAPS["auto_evol_trajectory_analysis"],
    ).collect()
    fb = {r["eid"]: r["feedback"] for r in traj}
    assert fb[1].startswith("Failed cases: 3")
    assert fb[2] == "All stages increased in complexity."

    # evolver consumes feedback and emits a new method prompt
    ev = apply_map(
        spark.createDataFrame(
            [(1, fb[1], "Evolve by adding constraints.")],
            "eid int, feedback string, evol_prompt string",
        ),
        MAPS["auto_evol_prompt_evolver"],
    ).collect()[0]
    assert ev["evol_prompt_evolved"].startswith("Evolve the instruction")


def test_metamath_inversion_loop(spark):
    from open_thoughts_spark.operators.maps import (
        MAPS, apply_map, metamath_inverse_expand,
    )

    base = spark.createDataFrame(
        [(1, "A train travels 120 miles in 3 hours. What is its speed?", "40")],
        "qid int, question string, answer string",
    )
    inv = metamath_inverse_expand(
        apply_map(base, MAPS["metamath_inverse_question"])
    ).collect()
    assert len(inv) == 2  # quantities 120 and 3
    answers = {r["inverse_answer"] for r in inv}
    assert answers == {"120", "3"}
    assert all("X" in r["inverse_question"] for r in inv)

    reph = apply_map(base, MAPS["metamath_rephrase_question"]).collect()[0]
    assert reph["rephrased_question"].startswith("Consider the following:")

    decl = apply_map(base, MAPS["metamath_self_verification"]).collect()[0]
    assert decl["declarative_statement"].endswith("is 40.")

    clone = apply_map(base, MAPS["metamath_problem_clone"]).collect()[0]
    assert "121 miles" in clone["cloned_question"]  # every number bumped

    solved = apply_map(
        spark.createDataFrame(
            [(1, "A train travels X miles in 3 hours at 40 mph.", "120")],
            "qid int, inverse_question string, inverse_answer string",
        ),
        MAPS["metamath_solve_inverse"],
    ).collect()[0]
    assert solved["predicted_answer"] in ("120", "1200")
    assert solved["solution"].startswith("Worked")


def test_autoverification_consistency_vote(spark):
    import json as _json

    from open_thoughts_spark.operators.maps import MAPS, apply_map

    df = spark.createDataFrame(
        [
            (1, "what is 2+2?", _json.dumps(
                ["steps... answer: 4", "thus answer: 4", "answer: 5"])),
        ],
        "qid int, question string, responses_json string",
    )
    for name in ("math_same", "code_same", "science_same"):
        row = apply_map(df, MAPS[name]).collect()[0]
        assert row["agreeing_indices"] == [0, 1]
        assert "agreeing group" in row["verification_reasoning"]


def test_deepseek_judge_and_code_golf(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    j = apply_map(
        spark.createDataFrame(
            [(1, "2+2?", "4", "the answer is 4"),
             (2, "2+2?", "4", "the answer is 5")],
            "qid int, question string, golden_answer string, attempt string",
        ),
        MAPS["deepseek_judge"],
    ).collect()
    got = {r["qid"]: r["correct"] for r in j}
    assert got == {1: True, 2: False}
    assert all("\\boxed{" in r["judge_reasoning"] for r in j)

    g = apply_map(
        spark.createDataFrame(
            [(1, "golfed:\n```python\nrun=lambda s:s[::-1]\n```")],
            "sid int, solution string",
        ),
        MAPS["code_golf_extractor"],
    ).collect()[0]
    assert g["code"].startswith("import sys")
    assert "run=lambda" in g["code"]


def test_airoboros_and_webinstruct_family(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    seeds = spark.createDataFrame([(1, "make a scene")],
                                  "sid int, seed_prompt string")
    ctx = apply_map(seeds, MAPS["contextual_instructions"]).collect()[0]
    assert ctx["context"].startswith("Context paragraph")
    assert ctx["contextual_instruction"].startswith("Using the context")

    exp = apply_map(seeds, MAPS["experience"]).collect()[0]
    assert exp["experience_instruction"].startswith("Describe")
    assert exp["experience_response"]

    qa = apply_map(
        spark.createDataFrame(
            [(1, "inventory items: apples, pears, plums", "what items?")],
            "cid int, context string, question string",
        ),
        MAPS["list_qa"],
    ).collect()[0]
    assert qa["answer_list"] == ["apples", "pears", "plums"]

    dom = apply_map(
        spark.createDataFrame(
            [(1, "solve the integral of x squared"),
             (2, "the cell divides by mitosis"),
             (3, "a story about nothing in particular")],
            "did int, text string",
        ),
        MAPS["webinstruct_classify_educational_domain"],
    ).collect()
    got = {r["did"]: r["educational_domain"] for r in dom}
    assert got == {1: "mathematics", 2: "biology", 3: "other"}

    rev = apply_map(
        spark.createDataFrame(
            [(1, "what is gravity", "a force")],
            "qid int, question string, answer string",
        ),
        MAPS["webinstruct_revise_qa"],
    ).collect()[0]
    assert rev["revised_question"].endswith("? (revised)")
    assert rev["revised_answer"].startswith("a force")

    og = apply_map(seeds, MAPS["open_gpt"]).collect()[0]
    assert og["instruction"].startswith("Discuss")

    for name in ("sky_t1_ICPC_difficulty", "sky_t1_science_difficulty"):
        d = apply_map(
            spark.createDataFrame([(1, "hard problem")],
                                  "pid int, problem string"),
            MAPS[name],
        ).collect()[0]
        assert 1 <= d["difficulty"] <= 10


def test_rate_limited_backend_paces_batches():
    """Token bucket: a burst passes untouched; past the burst each prompt
    costs 1/qps seconds of sleep; pickled task copies landing in the same
    worker process SHARE one bucket (no free burst per task)."""
    import pickle

    import pandas as pd

    from open_thoughts_spark.operators.completions import (
        RateLimitedBackend,
        mock_backend,
    )

    t = [0.0]
    sleeps = []

    def clock():
        return t[0]

    def sleep(s):
        sleeps.append(s)
        t[0] += s

    rb = RateLimitedBackend(mock_backend, qps=10, burst=10, clock=clock, sleep=sleep)
    out = rb(pd.Series(["a"] * 10))  # exactly the burst: no sleep
    assert len(out) == 10 and sleeps == []
    rb(pd.Series(["b"] * 5))  # bucket empty: 5 tokens needed -> 0.5s
    assert sleeps == [0.5]
    t[0] += 1.0  # 1s passes -> 10 tokens refill (capped at burst)
    rb(pd.Series(["c"] * 8))  # 8 <= 10 available: no sleep
    assert sleeps == [0.5]
    # a second instance sharing the same key (what a pickled task copy in
    # one worker becomes) draws from the SAME bucket: only 2 tokens left
    rb2 = RateLimitedBackend(
        mock_backend, qps=10, burst=10, clock=clock, sleep=sleep, key=rb.key
    )
    rb2(pd.Series(["d"] * 5))
    assert sleeps == [0.5, 0.3]  # needed 5, had 2 -> 0.3s
    # pickling drops no configuration and keeps the shared key
    rb3 = pickle.loads(pickle.dumps(
        RateLimitedBackend(mock_backend, qps=10, key="fixed")
    ))
    assert rb3.key == "fixed" and rb3.qps == 10
    # outputs still the deterministic mock
    assert out.map(lambda s: s.startswith("[mock:")).all()

    import pytest as _p

    with _p.raises(ValueError, match="qps"):
        RateLimitedBackend(mock_backend, qps=0)


def test_rate_limiter_shared_across_tasks_per_worker():
    """Per-executor scope simulation (round-4): two TASK deserializations
    of the same limiter in one worker process share one bucket — the
    second task gets no free burst; a separate worker process (its own
    module state) starts with its own full burst, so cluster-wide QPS =
    workers x qps, exactly as the docstring sizes it."""
    import copy

    import pandas as pd
    import pytest

    from open_thoughts_spark.operators import completions as C

    sleeps: list[float] = []
    t = [0.0]
    limiter = C.RateLimitedBackend(
        lambda s: s, qps=10.0, burst=10.0,
        clock=lambda: t[0], sleep=sleeps.append, key="shared-test",
    )
    # Spark ships each task its own deserialized copy (cloudpickle);
    # deepcopy simulates that fresh-copy-per-task behavior
    task_a = copy.deepcopy(limiter)
    task_b = copy.deepcopy(limiter)
    C._WORKER_BUCKETS.pop("shared-test", None)
    try:
        task_a(pd.Series(["p"] * 10))      # drains the worker's burst
        assert sleeps == []
        task_b(pd.Series(["p"] * 10))      # same worker: must wait, no free burst
        assert sleeps == [pytest.approx(1.0)]
        # a DIFFERENT worker process = fresh module state: full burst again
        saved = C._WORKER_BUCKETS.pop("shared-test")
        task_c = copy.deepcopy(limiter)
        task_c(pd.Series(["p"] * 10))
        assert len(sleeps) == 1            # no extra sleep in the new worker
        assert saved is not C._WORKER_BUCKETS.get("shared-test")
    finally:
        C._WORKER_BUCKETS.pop("shared-test", None)


def test_openai_compatible_backend_request_shape_and_parse():
    """The HTTP backend posts one user message per prompt and returns
    choices[0].message.content; transport is injectable so no network."""
    import json

    from open_thoughts_spark.operators.completions import (
        openai_compatible_backend,
    )

    seen = []

    def fake_transport(url, body, headers):
        req = json.loads(body)
        seen.append((url, req, dict(headers)))
        return json.dumps(
            {"choices": [{"message": {"content": "echo:" + req["messages"][0]["content"]}}]}
        )

    be = openai_compatible_backend(
        "http://llm.example/v1/", "test-model", transport=fake_transport,
        concurrency=2,
    )
    out = be(pd.Series(["alpha", "beta", None], index=[3, 5, 7]))
    assert list(out) == ["echo:alpha", "echo:beta", "echo:"]
    assert list(out.index) == [3, 5, 7]
    url, req, headers = seen[0]
    assert url == "http://llm.example/v1/chat/completions"
    assert req["model"] == "test-model"
    assert req["messages"] == [{"role": "user", "content": "alpha"}]
    assert headers["Content-Type"] == "application/json"


def test_openai_compatible_backend_retries_then_raises(monkeypatch):
    import json

    from open_thoughts_spark.operators import completions as cmod

    monkeypatch.setattr(
        "time.sleep", lambda s: None
    )  # instant backoff in test
    calls = {"n": 0}

    def flaky(url, body, headers):
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("connection reset")
        return json.dumps({"choices": [{"message": {"content": "ok"}}]})

    be = cmod.openai_compatible_backend(
        "http://x", "m", transport=flaky, concurrency=1
    )
    assert list(be(pd.Series(["p"]))) == ["ok"]
    assert calls["n"] == 3

    def always_down(url, body, headers):
        raise OSError("down")

    be2 = cmod.openai_compatible_backend(
        "http://x", "m", transport=always_down, max_retries=2, concurrency=1
    )
    try:
        be2(pd.Series(["p"]))
        assert False, "expected RuntimeError"
    except RuntimeError as e:
        assert "2 attempts" in str(e)


def test_openai_compatible_backend_api_key_header(monkeypatch):
    import json

    from open_thoughts_spark.operators.completions import (
        openai_compatible_backend,
    )

    monkeypatch.setenv("MY_KEY_ENV", "sk-test-123")
    got = {}

    def t(url, body, headers):
        got.update(headers)
        return json.dumps({"choices": [{"message": {"content": "x"}}]})

    be = openai_compatible_backend(
        "http://x", "m", api_key_env="MY_KEY_ENV", transport=t, concurrency=1
    )
    be(pd.Series(["p"]))
    assert got["Authorization"] == "Bearer sk-test-123"
