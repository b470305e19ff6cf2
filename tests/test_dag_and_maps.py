"""Declarative pipeline config parsing/validation + completions maps.

Parse behaviors mirror the reference's engine/tests/test_parse.py:10-138
(default input chaining, explicit inputs/outputs, mixed) plus the error
paths (dup id, unknown ref, unknown type, cycle); one YAML-defined pipeline
runs end to end through quality_filter + scrub + a completions map.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_thoughts_spark.pipeline.dag import (
    DAGParseError,
    parse_dag,
    parse_yaml_config,
    run_dag,
)


def _op(oid, typ="filter", **extra):
    cfg = {"type": typ, **extra}
    if typ == "filter":
        cfg.setdefault("condition", "1=1")
    return {"id": oid, "config": cfg}


def test_parse_dag_with_defaults():
    dag = parse_dag(
        {
            "name": "t",
            "operators": [
                _op("op1", "parquet_source", path="x"),
                _op("op2"),
                _op("op3"),
            ],
        }
    )
    assert dag.name == "t"
    assert [o.input_ids for o in dag.operators] == [[], ["op1"], ["op2"]]
    assert dag.output_ids == ["op3"]


def test_parse_dag_explicit_and_mixed():
    dag = parse_dag(
        {
            "name": "t",
            "operators": [
                _op("op1", "parquet_source", path="x"),
                {"id": "op2", "input_ids": ["op1"], "config": {"type": "filter", "condition": "1=1"}},
                {"id": "op3", "input_ids": ["op1", "op2"], "config": {"type": "merge", "on": "k"}},
            ],
            "output_ids": ["op2", "op3"],
        }
    )
    assert dag.operators[2].input_ids == ["op1", "op2"]
    assert dag.output_ids == ["op2", "op3"]


@pytest.mark.parametrize(
    "mutation, msg",
    [
        (lambda c: c["operators"].append(_op("op1")), "duplicate"),
        (lambda c: c["operators"][1].update(input_ids=["nope"]), "unknown input"),
        (lambda c: c["operators"][1]["config"].update(type="wat"), "unknown operator type"),
        (lambda c: c.pop("name"), "requires"),
        (
            lambda c: (
                c["operators"][0].update(input_ids=["op2"]),
                c["operators"][1].update(input_ids=["op1"]),
            ),
            "cycle",
        ),
    ],
)
def test_parse_dag_validation_errors(mutation, msg):
    config = {
        "name": "t",
        "operators": [_op("op1", "parquet_source", path="x"), _op("op2")],
    }
    mutation(config)
    with pytest.raises(DAGParseError, match=msg):
        parse_dag(config)


def test_yaml_pipeline_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "the quick brown fox email a@b.co", "user"),
            (2, "As an AI language model I cannot", "assistant"),
            (3, "der die das und ist nicht ein", "assistant"),
        ],
        "doc_id int, text string, role string",
    ).write.parquet(src)
    yml = tmp_path / "pipe.yaml"
    yml.write_text(
        f"""
name: qf_pipeline
operators:
  - id: load
    config: {{type: parquet_source, path: "{src}"}}
  - id: qf
    config: {{type: quality_filter, with_turn_order: false}}
  - id: kept
    config: {{type: filter, condition: "keep"}}
  - id: scrubbed
    config: {{type: scrub}}
""",
    )
    dag = parse_dag(parse_yaml_config(str(yml)))
    out = run_dag(spark, dag)["scrubbed"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 2 not in rows  # boilerplate dropped by the quality filter
    assert "<EMAIL>" in rows[1]["scrubbed_text"]


def test_completions_maps_shapes(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    df = spark.createDataFrame(
        [
            ("what is 2+2", "4", "the answer is 4"),
            ("capital of france", "Paris", "London"),
        ],
        "instruction string, golden_answer string, attempt string",
    )
    judged = {r["instruction"]: r for r in apply_map(df, MAPS["judge"]).collect()}
    assert judged["what is 2+2"]["model_judgement"] is True
    assert judged["capital of france"]["model_judgement"] is False
    assert judged["what is 2+2"]["model_judgement_full"].endswith("yes")

    probs = spark.createDataFrame(
        [("solve x+1=2",), ("prove fermat",)], "problem string"
    )
    graded = apply_map(probs, MAPS["sky_t1_math_difficulty"]).collect()
    assert all(1 <= r["difficulty"] <= 10 for r in graded)
    # deterministic across runs/partitions
    graded2 = apply_map(probs.repartition(3), MAPS["sky_t1_math_difficulty"]).collect()
    assert {(r["problem"], r["difficulty"]) for r in graded} == {
        (r["problem"], r["difficulty"]) for r in graded2
    }

    answers = spark.createDataFrame(
        [("first 145 then 293 so total is 438",), ("no numbers here",)],
        "detailed_answer string",
    )
    ex = {r["detailed_answer"]: r["numerical_answer"]
          for r in apply_map(answers, MAPS["extract_math_answer"]).collect()}
    assert ex["first 145 then 293 so total is 438"] == "438"
    assert ex["no numbers here"] == ""

    reasoned = apply_map(probs, MAPS["reason_annotate"]).collect()
    assert all(r["reasoning"].startswith("trace [") for r in reasoned)
    assert all(r["solution"].startswith("answer-") for r in reasoned)


def test_apply_map_missing_column_errors(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    df = spark.createDataFrame([("x",)], "other string")
    with pytest.raises(ValueError, match="missing input columns"):
        apply_map(df, MAPS["judge"])


# --- tree search scaffold ---

def test_beam_search_respects_width_depth_and_paths(spark):
    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        mock_expand,
    )

    prompts = spark.createDataFrame(
        [(1, "solve task one"), (2, "solve task two")],
        "prompt_id long, instruction string",
    )
    cfg = BeamSearchConfig(beam_width=3, beam_depth=4)
    out = beam_search(prompts, mock_expand(branch_factor=3), cfg).collect()
    assert out, "search produced nodes"
    by_prompt = {}
    for r in out:
        by_prompt.setdefault(r["prompt_id"], []).append(r)
        assert 1 <= r["level"] <= 4
        assert len(r["path"].split(" -> ")) == r["level"]  # path mirrors depth
        assert r["path"].startswith("step-")
    assert set(by_prompt) == {1, 2}  # all prompts searched in lockstep
    # per round, at most beam_width survivors per prompt -> per level too
    for pid, rows in by_prompt.items():
        per_level = {}
        for r in rows:
            per_level[r["level"]] = per_level.get(r["level"], 0) + 1
        assert all(v <= 3 for v in per_level.values()), per_level

    # determinism across partitionings
    out2 = beam_search(prompts.repartition(5), mock_expand(3), cfg).collect()
    assert {(r["prompt_id"], r["path"]) for r in out} == {
        (r["prompt_id"], r["path"]) for r in out2
    }


def test_beam_search_node_budget_stops_expansion(spark):
    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        mock_expand,
    )

    prompts = spark.createDataFrame(
        [(1, "budgeted task")], "prompt_id long, instruction string"
    )
    cheap = beam_search(
        prompts, mock_expand(4), BeamSearchConfig(beam_width=4, beam_depth=6, node_budget=4)
    ).collect()
    rich = beam_search(
        prompts, mock_expand(4), BeamSearchConfig(beam_width=4, beam_depth=6)
    ).collect()
    assert max(r["level"] for r in cheap) < max(r["level"] for r in rich)


def test_beam_search_budget_keeps_exhausted_prompt_output(spark):
    """Code-review r2: a budget-exhausted prompt must keep its best frontier
    in the output even while other prompts continue searching."""
    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        mock_expand,
    )

    prompts = spark.createDataFrame(
        [(1, "short budget prompt"), (2, "long budget prompt")],
        "prompt_id long, instruction string",
    )
    # budget 4 retires both prompts quickly; depth 6 keeps the loop going
    out = beam_search(
        prompts, mock_expand(4), BeamSearchConfig(beam_width=4, beam_depth=6, node_budget=4)
    ).collect()
    assert {r["prompt_id"] for r in out} == {1, 2}
    # no duplicate (prompt, path) rows from the retire/frontier interplay
    keys = [(r["prompt_id"], r["path"]) for r in out]
    assert len(keys) == len(set(keys))


def test_chat_classifier_and_list_maps(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map, explode_list_map

    chat = spark.createDataFrame([("hello there",)], "user_message string")
    out = apply_map(chat, MAPS["chat"]).collect()[0]
    assert out["completion"].startswith("reply-")

    clf = spark.createDataFrame(
        [("is this spam?", "buy now"), ("is this spam?", "meeting at 3")],
        "question string, text string",
    )
    rows = apply_map(clf, MAPS["binary_classifier"]).collect()
    assert all(isinstance(r["response"], bool) for r in rows)
    assert all(r["classifier_reasoning"].startswith("because [") for r in rows)

    req = spark.createDataFrame([("list three fruits",)], "request string")
    listed = apply_map(req, MAPS["list"])
    exploded = explode_list_map(listed).collect()
    assert 1 <= len(exploded) <= 3
    assert all(r["item"].startswith("item-") for r in exploded)
    assert all(r["request"] == "list three fruits" for r in exploded)


def test_example_yaml_pipeline_runs(spark):
    """The checked-in examples/ pipeline must keep parsing and running."""
    from open_thoughts_spark.pipeline.dag import parse_dag, parse_yaml_config, run_dag

    dag = parse_dag(parse_yaml_config("examples/quality_filter_pipeline.yaml"))
    outs = run_dag(spark, dag, base_path="/root/testdata/sf0.001")
    df = outs["final"]
    assert df.columns == ["doc_id", "lang", "drop_reason", "scrubbed_text"]
    assert df.count() > 0
    assert df.filter("drop_reason is not null").count() == 0  # kept only


def test_critic_ranker_fuser_maps(spark):
    import json

    from open_thoughts_spark.operators.maps import MAPS, apply_map

    df = spark.createDataFrame(
        [("what is 2+2", json.dumps(["four", "the answer is four", "4"]))],
        "query string, responses_json string",
    )
    crit = apply_map(df, MAPS["critic"]).collect()[0]
    assert crit["critique"].startswith("critique [")

    ranked = apply_map(df, MAPS["ranker"]).collect()[0]
    assert json.loads(ranked["ranking_json"]) == [2, 0, 1]  # by length, text

    fused = apply_map(df, MAPS["fuser"]).collect()[0]
    assert fused["fused_response"].startswith("the answer is four [fused ")


def test_beam_search_budget_no_driver_collect(spark, monkeypatch):
    """Budget accounting must stay distributed: no .collect() inside the
    search loop (the r2 version collected per-round successor counts into a
    driver dict — a per-round transfer proportional to the prompt count)."""
    from pyspark.sql import DataFrame
    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        mock_expand,
    )

    calls = []
    orig = DataFrame.collect
    monkeypatch.setattr(DataFrame, "collect", lambda self: calls.append(1) or orig(self))
    prompts = spark.createDataFrame(
        [(i, f"prompt {i}") for i in range(3)], "prompt_id long, instruction string"
    )
    out = beam_search(
        prompts, mock_expand(4),
        BeamSearchConfig(beam_width=4, beam_depth=5, node_budget=8),
    )
    assert not calls  # nothing collected while building the plan
    rows = orig(out)
    assert {r["prompt_id"] for r in rows} == {0, 1, 2}
    # every prompt's expansion total respects the budget + one-round overshoot
    # bound (retirement happens at round start, after the round that crossed)


def test_load_preexisting_inlines_namespaced_subdag():
    frameworks = {
        "child": {
            "name": "child",
            "operators": [
                _op("src", "parquet_source", path="x"),
                _op("clean"),
            ],
        }
    }
    dag = parse_dag(
        {
            "name": "parent",
            "operators": [
                {"id": "base", "config": {"type": "load_preexisting",
                                          "framework_name": "child"}},
                _op("post"),
            ],
        },
        frameworks,
    )
    ids = [o.id for o in dag.operators]
    assert ids == ["child::src", "child::clean", "post"]
    # default chaining through the load op resolves to the child's output
    assert dag.operators[2].input_ids == ["child::clean"]
    assert dag.output_ids == ["post"]


def test_load_preexisting_dedupes_and_flattens_outputs():
    frameworks = {
        "multi": {
            "name": "multi",
            "operators": [
                _op("a", "parquet_source", path="x"),
                _op("b", "parquet_source", path="y"),
            ],
            "output_ids": ["a", "b"],
        }
    }
    dag = parse_dag(
        {
            "name": "parent",
            "operators": [
                {"id": "one", "config": {"type": "load_preexisting",
                                         "framework_name": "multi"}},
                {"id": "two", "config": {"type": "load_preexisting",
                                         "framework_name": "multi"}},
                {"id": "m", "input_ids": ["one", "two"],
                 "config": {"type": "mix", "key_cols": ["k"]}},
            ],
        },
        frameworks,
    )
    ids = [o.id for o in dag.operators]
    assert ids == ["multi::a", "multi::b", "m"]  # inlined ONCE
    # both references flatten to the child's two outputs
    assert dag.operators[2].input_ids == [
        "multi::a", "multi::b", "multi::a", "multi::b"
    ]


def test_load_preexisting_nested_and_cycles():
    frameworks = {
        "leaf": {"name": "leaf",
                 "operators": [_op("s", "parquet_source", path="x")]},
        "mid": {"name": "mid",
                "operators": [
                    {"id": "inner", "config": {"type": "load_preexisting",
                                               "framework_name": "leaf"}},
                    _op("t"),
                ]},
        "loop_a": {"name": "loop_a",
                   "operators": [{"id": "x", "config": {
                       "type": "load_preexisting", "framework_name": "loop_b"}}]},
        "loop_b": {"name": "loop_b",
                   "operators": [{"id": "y", "config": {
                       "type": "load_preexisting", "framework_name": "loop_a"}}]},
    }
    dag = parse_dag(
        {"name": "p",
         "operators": [{"id": "m", "config": {"type": "load_preexisting",
                                              "framework_name": "mid"}}]},
        frameworks,
    )
    assert [o.id for o in dag.operators] == ["leaf::s", "mid::t"]
    assert dag.operators[1].input_ids == ["leaf::s"]
    assert dag.output_ids == ["mid::t"]
    with pytest.raises(DAGParseError, match="cycle"):
        parse_dag(
            {"name": "p",
             "operators": [{"id": "m", "config": {
                 "type": "load_preexisting", "framework_name": "loop_a"}}]},
            frameworks,
        )
    with pytest.raises(DAGParseError, match="unknown framework"):
        parse_dag(
            {"name": "p",
             "operators": [{"id": "m", "config": {
                 "type": "load_preexisting", "framework_name": "nope"}}]},
            frameworks,
        )


def test_load_preexisting_yaml_end_to_end(spark):
    from open_thoughts_spark.pipeline.dag import load_frameworks_dir

    frameworks = load_frameworks_dir("examples")
    dag = parse_dag(
        parse_yaml_config("examples/composed_pipeline.yaml"), frameworks
    )
    assert [o.id for o in dag.operators] == [
        "base_documents::load", "base_documents::decide", "kept", "final"
    ]
    outs = run_dag(spark, dag, base_path="/root/testdata/sf0.001")
    df = outs["final"]
    assert df.columns == ["doc_id", "lang", "drop_reason", "scrubbed_text"]
    assert df.count() > 0
    assert df.filter(F.col("drop_reason") != "kept").count() == 0


# --- typed config validation (VERDICT r3 #4; engine/tests/test_parse.py
# spirit: configs reject unknown/missing/mistyped fields at parse time) ---

def _cfg(ops):
    return {"name": "t", "operators": ops}


@pytest.mark.parametrize(
    "config, msg",
    [
        # unknown key (the typo case that used to fail late in the operator)
        (
            _cfg([_op("s", "parquet_source", path="x", pathh="y")]),
            "unknown config key",
        ),
        # missing required key
        (_cfg([_op("s", "parquet_source")]), "missing required config key"),
        # wrong type
        (
            _cfg([_op("s", "parquet_source", path=42)]),
            "expects str, got int",
        ),
        (
            _cfg([
                _op("s", "parquet_source", path="x"),
                _op("t", "truncate", n="ten"),
            ]),
            "expects int, got str",
        ),
        # bool must not satisfy an int slot
        (
            _cfg([
                _op("s", "parquet_source", path="x"),
                _op("t", "truncate", n=True),
            ]),
            "expects int, got bool",
        ),
        # quality_filter kwargs are typo-checked at parse time too
        (
            _cfg([
                _op("s", "parquet_source", path="x"),
                _op("q", "quality_filter", langid_mod="udf"),
            ]),
            "unknown config key",
        ),
        (
            _cfg([_op("lp", "load_preexisting", framework_name=1)]),
            "expects str, got int",
        ),
    ],
)
def test_typed_config_validation_rejects(config, msg):
    with pytest.raises(DAGParseError, match=msg):
        parse_dag(config, frameworks={"f": {"name": "f", "operators": []}})


def test_typed_config_validation_accepts_valid():
    dag = parse_dag(
        _cfg([
            _op("s", "parquet_source", path="x"),
            _op("q", "quality_filter", langid_mode="native", role_col=None),
            _op("m", "completions_map", map="url_classify", n_repeat=3,
                merge_shards=1),
        ])
    )
    assert [o.id for o in dag.operators] == ["s", "q", "m"]


def test_apply_map_n_repeat_and_merge_shards(spark):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    df = spark.createDataFrame(
        [(1, "mathacademy1.example.org"), (2, "shop2.example.org")],
        "doc_id int, url string",
    )
    out = apply_map(df, MAPS["url_classify"], n_repeat=3, merge_shards=1)
    rows = out.collect()
    assert len(rows) == 6
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r["url_classification"])
    # deterministic mock: all copies agree; classification is per-url
    assert by_id[1] == [True, True, True]
    assert by_id[2] == [False, False, False]
    assert out.rdd.getNumPartitions() == 1
    with pytest.raises(ValueError, match="n_repeat"):
        apply_map(df, MAPS["url_classify"], n_repeat=0)


def test_completions_n_repeat(spark):
    from open_thoughts_spark.operators.completions import (
        IDENTITY_MAP, completions,
    )

    df = spark.createDataFrame([("a",), ("b",)], "text string")
    out = completions(df, IDENTITY_MAP, n_repeat=2, merge_shards=1)
    got = sorted(r["completion"] for r in out.collect())
    # mock backend is deterministic -> copies identical
    assert len(got) == 4 and got[0] == got[1] and got[2] == got[3]


def test_dag_train_then_classifier_filter(spark, tmp_path):
    """The reference's train_fasttext -> fasttext YAML pair: train emits a
    one-row metadata dataset whose model_path feeds the scoring op through
    a REAL DAG edge (second input), hermetic NB backend end to end."""
    from open_thoughts_spark.pipeline.dag import parse_dag, run_dag

    labeled = spark.createDataFrame(
        [("math proof lemma theorem", "math")] * 5
        + [("cooking pasta recipe sauce", "other")] * 5,
        "text string, label string",
    )
    labeled.write.parquet(str(tmp_path / "labeled"))
    docs = spark.createDataFrame(
        [(1, "lemma theorem proof"), (2, "pasta sauce recipe")],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "docs"))

    dag = parse_dag(
        {
            "name": "train-score",
            "operators": [
                {"id": "labeled", "config": {"type": "parquet_source", "path": "labeled"}},
                {
                    "id": "trained",
                    "config": {
                        "type": "train_classifier",
                        "text_col": "text",
                        "label_col": "label",
                        "model_out": str(tmp_path / "nb_model.npz"),
                        "dim": 4096,
                    },
                    "input_ids": ["labeled"],
                },
                {"id": "docs", "config": {"type": "parquet_source", "path": "docs"}},
                {
                    "id": "kept",
                    "config": {
                        "type": "classifier_filter",
                        "text_col": "text",
                        "target_label": "math",
                        "filter_threshold": 0.5,
                    },
                    "input_ids": ["docs", "trained"],
                },
            ],
            "output_ids": ["kept", "trained"],
        }
    )
    outs = run_dag(spark, dag, base_path=str(tmp_path))
    meta = outs["trained"].collect()[0]
    assert meta["model_path"].endswith(".npz")
    assert meta["n_classes"] == 2
    kept = outs["kept"].collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["_clf_score"] > 0.5


def test_dag_embed_texts_op(spark, tmp_path):
    from open_thoughts_spark.operators.embedding import embed_kernel
    from open_thoughts_spark.pipeline.dag import parse_dag, run_dag

    spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "d"))
    dag = parse_dag(
        {
            "name": "embed",
            "operators": [
                {"id": "d", "config": {"type": "parquet_source", "path": "d"}},
                {
                    "id": "e",
                    "config": {"type": "embed_texts", "text_col": "text", "dim": 8},
                },
            ],
        }
    )
    vec = run_dag(spark, dag, base_path=str(tmp_path))["e"].collect()[0]["embedding"]
    assert vec == embed_kernel("alpha beta", 8, 512, True).tolist()


def test_dag_classifier_filter_config_validation(spark):
    import pytest

    from open_thoughts_spark.pipeline.dag import DAGParseError, parse_dag

    with pytest.raises(DAGParseError, match="unknown config key"):
        parse_dag(
            {
                "name": "bad",
                "operators": [
                    {"id": "s", "config": {"type": "parquet_source", "path": "x"}},
                    {
                        "id": "c",
                        "config": {
                            "type": "classifier_filter",
                            "text_col": "text",
                            "target_label": "t",
                            "modle_path": "/oops",  # typo'd key
                        },
                    },
                ],
            }
        )


def test_llm_expand_over_completions_backend(spark):
    """Tree search against a (faked) LLM backend: llm_expand builds one
    prompt per (node, branch), parses STEP/SCORE/TERMINAL tolerantly, and
    beam_search runs on it end to end — the production plug for the
    hermetic mock_expand."""
    import hashlib as _h

    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        llm_expand,
    )

    def fake_llm(prompts):
        import hashlib
        import pandas as pd

        out = []
        for p in prompts:
            h = hashlib.md5(p.encode()).hexdigest()
            score = int(h[:4], 16) / 0xFFFF
            term = "yes" if h[-1] in "01" else "no"
            out.append(
                f"STEP: move-{h[:5]}\nSCORE: {score:.3f}\nTERMINAL: {term}"
            )
        return pd.Series(out, index=prompts.index)

    prompts = spark.createDataFrame(
        [(1, "prove A"), (2, "prove B")], "prompt_id long, instruction string"
    )
    out = beam_search(
        prompts,
        llm_expand(fake_llm, branch_factor=2),
        BeamSearchConfig(beam_width=2, beam_depth=3),
    )
    rows = out.collect()
    assert rows  # beams completed
    assert {r["prompt_id"] for r in rows} <= {1, 2}
    for r in rows:
        assert "move-" in r["path"]
        assert 0.0 <= r["score"] <= 1.0
    # determinism: the md5-derived fake makes the whole search replayable
    rows2 = beam_search(
        prompts,
        llm_expand(fake_llm, branch_factor=2),
        BeamSearchConfig(beam_width=2, beam_depth=3),
    ).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_llm_expand_malformed_response_degrades():
    import pandas as pd

    from open_thoughts_spark.operators.tree_search import llm_expand

    def garbage(prompts):
        return pd.Series(
            ["no structure at all here", "", "STEP: ok\nSCORE: banana\nTERMINAL: yes"],
            index=prompts.index,
        )

    chunk = pd.DataFrame(
        [{"prompt_id": 1, "prompt": "p", "path": "", "level": 0}]
    )
    out = llm_expand(garbage, branch_factor=3)(chunk)
    assert len(out) == 3
    assert list(out["score"]) == [0.5, 0.5, 0.5]  # fallbacks
    assert out["path"][0] == "no structure at all here"
    assert out["path"][1] == "(empty)"
    assert out["path"][2] == "ok" and bool(out["is_terminal"][2])


def test_dag_decontaminate_and_code_judge_ops(spark, tmp_path):
    """YAML surface for decontamination (two-input op) and the sandboxed
    code judge with keep_correct_only rejection sampling."""
    from open_thoughts_spark.pipeline.dag import parse_dag, run_dag

    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bank",
             "```python\nimport sys\nprint(int(sys.stdin.read()) * 2)\n```",
             '{"inputs": ["21"], "outputs": ["42"]}'),
            (2, "totally clean document with no benchmark overlap anywhere here",
             "```python\nprint('wrong')\n```",
             '{"inputs": ["1"], "outputs": ["2"]}'),
        ],
        "doc_id long, text string, response string, tests string",
    ).write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",)],
        "question string",
    ).write.parquet(str(tmp_path / "evals"))

    dag = parse_dag(
        {
            "name": "decon-judge",
            "operators": [
                {"id": "docs", "config": {"type": "parquet_source", "path": "docs"}},
                {"id": "evals", "config": {"type": "parquet_source", "path": "evals"}},
                {
                    "id": "clean",
                    "config": {
                        "type": "decontaminate",
                        "text_col": "text",
                        "eval_text_col": "question",
                        "ngram_n": 5,
                        "id_col": "doc_id",
                    },
                    "input_ids": ["docs", "evals"],
                },
                {
                    "id": "judged",
                    "config": {"type": "code_judge", "timeout_s": 3.0},
                    "input_ids": ["clean"],
                },
                {
                    "id": "correct_only",
                    "config": {
                        "type": "code_judge",
                        "keep_correct_only": True,
                        "timeout_s": 3.0,
                    },
                    "input_ids": ["clean"],
                },
            ],
            "output_ids": ["clean", "judged", "correct_only"],
        }
    )
    outs = run_dag(spark, dag, base_path=str(tmp_path))
    # doc 1 shares the 5-gram "the quick brown fox jumps" with the eval set
    assert [r["doc_id"] for r in outs["clean"].collect()] == [2]
    judged = outs["judged"].collect()
    assert [(r["doc_id"], r["correct"]) for r in judged] == [(2, False)]
    assert outs["correct_only"].count() == 0  # doc 2's code prints wrong


def test_example_classifier_yaml_runs(spark):
    """The checked-in classifier curation example must keep parsing and
    running (train -> metadata-path -> score chain)."""
    from open_thoughts_spark.pipeline.dag import parse_dag, parse_yaml_config, run_dag

    dag = parse_dag(
        parse_yaml_config("examples/classifier_curation_pipeline.yaml")
    )
    outs = run_dag(spark, dag, base_path="/root/testdata/sf0.001")
    assert outs["trained"].collect()[0]["n_classes"] == 2
    scored = outs["final"]
    assert scored.columns == ["doc_id", "lang", "_clf_score"]
    vals = [r["_clf_score"] for r in scored.collect()]
    assert vals and all(0.0 <= v <= 1.0 for v in vals)


def test_minhash_dedup_dag_accepts_bucket_cap(spark):
    """max_bucket_size must parse as a minhash_dedup config key and thread
    through to candidate_pairs: cap=0 drops every bucket, so no candidate
    pairs form and dedup keeps all rows even for exact duplicate texts."""
    from open_thoughts_spark.pipeline.dag import DAGParseError, parse_dag, run_dag

    def cfg(cap):
        return {
            "name": "t",
            "operators": [
                {
                    "id": "src",
                    "config": {
                        "type": "parquet_source",
                        "path": "documents.parquet",
                    },
                },
                {
                    "id": "dd",
                    "input_ids": ["src"],
                    "config": {
                        "type": "minhash_dedup",
                        "id_col": "doc_id",
                        "text_col": "text",
                        "min_jaccard": 0.2,
                        "num_perm": 8,
                        "bands": 4,
                        **cap,
                    },
                },
            ],
        }

    base = "/root/testdata/sf0.001"
    n_src = run_dag(spark, parse_dag(cfg({})), base_path=base)["dd"].count()
    capped = run_dag(
        spark, parse_dag(cfg({"max_bucket_size": 0})), base_path=base
    )["dd"]
    n_all = capped.count()
    assert n_all >= n_src  # cap=0: no buckets survive -> nothing dropped
    import pytest as _pytest

    with _pytest.raises(DAGParseError):
        parse_dag(cfg({"max_bucket_size": "two"}))


def test_token_budget_sample_dag_op(spark):
    """token_budget_sample must parse with typed keys and produce the same
    rows as calling sample_to_token_budget directly."""
    from open_thoughts_spark.pipeline.dag import parse_dag, run_dag
    from open_thoughts_spark.operators.relational import sample_to_token_budget
    from open_thoughts_spark.functions.text_stats import ws_token_count
    from pyspark.sql import functions as F

    dag = parse_dag(
        {
            "name": "t",
            "operators": [
                {
                    "id": "src",
                    "config": {"type": "parquet_source", "path": "documents.parquet"},
                },
                {
                    "id": "tok",
                    "input_ids": ["src"],
                    "config": {
                        "type": "function",
                        "function": "open_thoughts_spark.functions.text_stats.with_text_stats",
                    },
                },
                {
                    "id": "sampled",
                    "input_ids": ["tok"],
                    "config": {
                        "type": "token_budget_sample",
                        "domain_col": "lang",
                        "token_count_col": "ws_tokens",
                        "token_budget": 400,
                        "key_cols": ["doc_id"],
                    },
                },
            ],
        }
    )
    base = "/root/testdata/sf0.001"
    got = {r["doc_id"] for r in run_dag(spark, dag, base_path=base)["sampled"].collect()}
    docs = spark.read.parquet(f"{base}/documents.parquet").withColumn(
        "ws_tokens", ws_token_count(F.col("text"))
    )
    want = {
        r["doc_id"]
        for r in sample_to_token_budget(
            docs, "lang", "ws_tokens", 400, ["doc_id"]
        ).collect()
    }
    assert got == want and 0 < len(got) < docs.count()


def test_example_mixing_yaml_runs(spark):
    """The checked-in data-mixing example must keep parsing and running
    (stats -> token budget -> capped minhash dedup chain)."""
    from open_thoughts_spark.pipeline.dag import parse_dag, parse_yaml_config, run_dag

    dag = parse_dag(parse_yaml_config("examples/data_mixing_pipeline.yaml"))
    outs = run_dag(spark, dag, base_path="/root/testdata/sf0.001")
    final = outs["final"]
    assert final.columns == ["doc_id", "lang", "ws_tokens"]
    n = final.count()
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < n < src  # the budget really sampled something out
