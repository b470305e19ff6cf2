"""Representative completions prompt/parse maps — engine/maps parity.

The reference ships ~60 map classes, each a (prompt builder, response
parser) pair run through the completions operator
(/root/reference/open_thoughts_3/engine/maps/map_registry.py:1-112).
Forty-eight registry keys (incl. per-provider reasoner variants sharing one shape) are reproduced here against the mock backend (the
MOCK_VERIFY test posture — open_thoughts/math/judge.py:46-49), covering the
registry's families: judge/scorer/critic/ranker/fuser evaluation, chat +
reasoner shapes (DeepSeek judge incl. boxed-verdict parse), structured
extraction (math answer, WebInstruct QA/revise/domain-classify, code-golf
block extraction), list/generator, self-instruct (alpaca + seed tasks +
unnatural instructions + open_gpt), the AutoEvolInstruct
evolve/evolver/trajectory trio, the full Metamath inversion loop
(inverse-question quantities, rephrase, self-verification declaratives,
solve-inverse/rephrased, problem cloning), the AutoVerification
consistency votes (math/code/science 'same'), SkyT1 difficulty rubrics
(math/ICPC/science), the Airoboros contextual/counterfactual/experience/
list-QA family, URL classification and the OCR-shaped bytes->text map.
Representative of the first four:

- ``judge``          — JudgeMap (judge_map.py:10-60): evaluate an attempt
                       against a golden answer; response ends in yes/no.
- ``sky_t1_math_difficulty`` — SkyT1MathDifficultyMap: grade 1-10 with
                       reasoning, structured {difficulty, reasoning}.
- ``extract_math_answer``    — ExtractMathAnswerMap: pull the final
                       numerical answer, structured {numerical_answer}.
- ``reason_annotate``        — DeepSeekReasonerMap shape: response carries
                       a <think>...</think> trace then the final answer.

Each map's ``mock`` produces a VALID response deterministically (the judge
mock actually judges: yes iff the golden answer text occurs in the attempt),
so the parse path is exercised end to end without an LLM. A real backend
drops in per map unchanged.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class RichMap:
    """Whole-chunk prompt/parse map: multiple input columns in, one or more
    typed output columns out (the engine/maps CompletionsMap contract)."""

    name: str
    input_cols: list[str]
    build_prompt: Callable[[pd.DataFrame], pd.Series]
    parse_response: Callable[[pd.Series], pd.DataFrame]
    out_schema: str  # Spark DDL for the NEW columns
    mock: Callable[[pd.Series], pd.Series] = field(default=None)


def _digest(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()[:10]


def _load_str_list(r: str) -> list[str]:
    """Malformed real-backend output degrades to [] instead of killing the
    Spark task (sibling-parser convention)."""
    try:
        v = json.loads(r)
        return [str(x) for x in v] if isinstance(v, list) else []
    except (json.JSONDecodeError, ValueError, TypeError):
        return []


def _load_json_field(r: str, key: str) -> str:
    try:
        v = json.loads(r)
        return str(v.get(key, "")) if isinstance(v, dict) else ""
    except (json.JSONDecodeError, ValueError, TypeError):
        return ""


# --- judge (judge_map.py LLM_JUDGE_SYSTEM_PROMPT contract) ---

_JUDGE_PROMPT = (
    "Evaluate whether the attempt correctly responds to the inputs by "
    "comparing against the targets. End your response with a single word, "
    'either "yes" or "no".\n'
    "inputs: {inputs}\ntargets: {targets}\nattempt: {attempt}"
)


def _judge_prompt(chunk: pd.DataFrame) -> pd.Series:
    return pd.Series(
        [
            _JUDGE_PROMPT.format(inputs=i, targets=t, attempt=a)
            for i, t, a in zip(
                chunk["instruction"].fillna(""),
                chunk["golden_answer"].fillna(""),
                chunk["attempt"].fillna(""),
            )
        ],
        index=chunk.index,
    )


def _judge_mock(prompts: pd.Series) -> pd.Series:
    """Deterministic judge: yes iff the targets text occurs in the attempt
    (sections re-read from the prompt this module itself built)."""

    def judge(p: str) -> str:
        m = re.search(r"targets: (.*)\nattempt: (.*)$", p, re.S)
        ok = bool(m) and m.group(1).strip() != "" and m.group(1).strip() in m.group(2)
        return f"Compared attempt to targets [{_digest(p)}]. {'yes' if ok else 'no'}"

    return prompts.fillna("").map(judge)


def _judge_parse(raw: pd.Series) -> pd.DataFrame:
    # reference: final word of the response must be yes/no
    last = raw.fillna("").str.strip().str.split().str[-1].str.lower()
    return pd.DataFrame(
        {
            "model_judgement": last == "yes",
            "model_judgement_full": raw.fillna(""),
        }
    )


JUDGE_MAP = RichMap(
    name="judge",
    input_cols=["instruction", "golden_answer", "attempt"],
    build_prompt=_judge_prompt,
    parse_response=_judge_parse,
    out_schema="`model_judgement` boolean, `model_judgement_full` string",
    mock=_judge_mock,
)


# --- sky_t1_math_difficulty (AoPS 1-10 grading, structured output) ---

def _difficulty_prompt(chunk: pd.DataFrame) -> pd.Series:
    return (
        "You will be given a math problem. Grade the difficulty level from "
        "1-10 according to the AoPS standard. Problem to be labeled: "
        + chunk["problem"].fillna("")
    )


def _difficulty_mock(prompts: pd.Series) -> pd.Series:
    def grade(p: str) -> str:
        d = int(hashlib.sha256(p.encode()).hexdigest()[:8], 16) % 10 + 1
        return json.dumps({"difficulty": d, "reasoning": f"graded [{_digest(p)}]"})

    return prompts.fillna("").map(grade)


def _difficulty_parse(raw: pd.Series) -> pd.DataFrame:
    parsed = raw.fillna("{}").map(json.loads)
    return pd.DataFrame(
        {
            "difficulty": parsed.map(lambda d: int(d.get("difficulty", -1))),
            "difficulty_reasoning": parsed.map(lambda d: d.get("reasoning", "")),
        }
    )


DIFFICULTY_MAP = RichMap(
    name="sky_t1_math_difficulty",
    input_cols=["problem"],
    build_prompt=_difficulty_prompt,
    parse_response=_difficulty_parse,
    out_schema="`difficulty` int, `difficulty_reasoning` string",
    mock=_difficulty_mock,
)


# --- extract_math_answer (Metamath structured numerical extraction) ---

def _extract_prompt(chunk: pd.DataFrame) -> pd.Series:
    return (
        "You are an expert at extracting the short final numerical answer "
        'from a detailed answer. Output: {"numerical_answer": ...}\n'
        "Detailed answer: " + chunk["detailed_answer"].fillna("")
    )


def _extract_mock(prompts: pd.Series) -> pd.Series:
    """Actually extracts: last number in the detailed answer."""

    def extract(p: str) -> str:
        nums = re.findall(r"[0-9]+(?:\.[0-9]+)?", p.split("Detailed answer: ", 1)[-1])
        return json.dumps({"numerical_answer": nums[-1] if nums else ""})

    return prompts.fillna("").map(extract)


def _extract_parse(raw: pd.Series) -> pd.DataFrame:
    parsed = raw.fillna("{}").map(json.loads)
    return pd.DataFrame(
        {"numerical_answer": parsed.map(lambda d: str(d.get("numerical_answer", "")))}
    )


EXTRACT_ANSWER_MAP = RichMap(
    name="extract_math_answer",
    input_cols=["detailed_answer"],
    build_prompt=_extract_prompt,
    parse_response=_extract_parse,
    out_schema="`numerical_answer` string",
    mock=_extract_mock,
)


# --- reason_annotate (DeepSeekReasonerMap <think> trace shape) ---

def _reason_prompt(chunk: pd.DataFrame) -> pd.Series:
    return "Reason step by step, then answer. Problem: " + chunk["problem"].fillna("")


def _reason_mock(prompts: pd.Series) -> pd.Series:
    return prompts.fillna("").map(
        lambda p: f"<think>trace [{_digest(p)}]</think> answer-{_digest(p)}"
    )


def _reason_parse(raw: pd.Series) -> pd.DataFrame:
    think = raw.fillna("").str.extract(r"<think>(.*?)</think>", expand=False)
    answer = raw.fillna("").str.replace(
        r"^.*</think>\s*", "", regex=True, flags=re.S
    )
    return pd.DataFrame(
        {"reasoning": think.fillna(""), "solution": answer}
    )


REASON_MAP = RichMap(
    name="reason_annotate",
    input_cols=["problem"],
    build_prompt=_reason_prompt,
    parse_response=_reason_parse,
    out_schema="`reasoning` string, `solution` string",
    mock=_reason_mock,
)


def _reasoner_variant(name: str) -> RichMap:
    """The registry's per-provider reasoners (deepseek/kluster_deepseek/
    claude/grok/together_qwen — map_registry.py:66-90) share one map shape:
    think-trace + final answer; only the completions BACKEND differs, which
    in this harness is the pluggable ``backend=`` argument of apply_map.
    Registering them as named variants keeps reference configs portable."""
    return RichMap(
        name=name,
        input_cols=["problem"],
        build_prompt=_reason_prompt,
        parse_response=_reason_parse,
        out_schema="`reasoning` string, `solution` string",
        mock=_reason_mock,
    )


DEEPSEEK_REASONER_MAP = _reasoner_variant("deepseek_reasoner")
KLUSTER_DEEPSEEK_REASONER_MAP = _reasoner_variant("kluster_deepseek_reasoner")
CLAUDE_REASONER_MAP = _reasoner_variant("claude_reasoner")
GROK_REASONER_MAP = _reasoner_variant("grok_reasoner")
TOGETHER_QWEN_MAP = _reasoner_variant("together_qwen")


# --- chat (ChatMap: the plain system+user -> completion shape) ---

def _chat_prompt(chunk: pd.DataFrame) -> pd.Series:
    return "You are a helpful assistant.\nUser: " + chunk["user_message"].fillna("")


def _chat_mock(prompts: pd.Series) -> pd.Series:
    return prompts.fillna("").map(lambda p: f"reply-{_digest(p)}")


CHAT_MAP = RichMap(
    name="chat",
    input_cols=["user_message"],
    build_prompt=_chat_prompt,
    parse_response=lambda raw: pd.DataFrame({"completion": raw.fillna("")}),
    out_schema="`completion` string",
    mock=_chat_mock,
)


# --- binary_classifier (BinaryClassifierMap: bool + reasoning) ---

def _clf_prompt(chunk: pd.DataFrame) -> pd.Series:
    return (
        "Answer the classification question about the text with JSON "
        '{"response": bool, "reasoning": str}.\nQuestion: '
        + chunk["question"].fillna("")
        + "\nText: "
        + chunk["text"].fillna("")
    )


def _clf_mock(prompts: pd.Series) -> pd.Series:
    def classify(p: str) -> str:
        verdict = int(hashlib.sha256(p.encode()).hexdigest()[:2], 16) % 2 == 0
        return json.dumps({"response": verdict, "reasoning": f"because [{_digest(p)}]"})

    return prompts.fillna("").map(classify)


def _clf_parse(raw: pd.Series) -> pd.DataFrame:
    parsed = raw.fillna("{}").map(json.loads)
    return pd.DataFrame(
        {
            "response": parsed.map(lambda d: bool(d.get("response", False))),
            "classifier_reasoning": parsed.map(lambda d: d.get("reasoning", "")),
        }
    )


BINARY_CLASSIFIER_MAP = RichMap(
    name="binary_classifier",
    input_cols=["question", "text"],
    build_prompt=_clf_prompt,
    parse_response=_clf_parse,
    out_schema="`response` boolean, `classifier_reasoning` string",
    mock=_clf_mock,
)


# --- list (ListMap: structured list-of-strings, row-expanding) ---

def _list_prompt(chunk: pd.DataFrame) -> pd.Series:
    return (
        "Produce a JSON array of strings answering the request.\nRequest: "
        + chunk["request"].fillna("")
    )


def _list_mock(prompts: pd.Series) -> pd.Series:
    def items(p: str) -> str:
        d = _digest(p)
        k = int(d[:2], 16) % 3 + 1
        return json.dumps([f"item-{d}-{j}" for j in range(k)])

    return prompts.fillna("").map(items)


LIST_MAP = RichMap(
    name="list",
    input_cols=["request"],
    build_prompt=_list_prompt,
    parse_response=lambda raw: pd.DataFrame({"items_json": raw.fillna("[]")}),
    out_schema="`items_json` string",
    mock=_list_mock,
)


def explode_list_map(df: DataFrame, out_col: str = "item") -> DataFrame:
    """ListMap's row-expanding parse (list_map.py:28-41): one output row per
    list element, other columns duplicated. A malformed (unparseable)
    items_json yields ONE row with a NULL item — visible data loss instead
    of a silently vanished input row; a legitimately empty list yields
    zero rows, like the reference."""
    from pyspark.sql import functions as F

    parsed = F.from_json(F.col("items_json"), "array<string>")
    return df.withColumn(
        out_col,
        F.explode(F.coalesce(parsed, F.array(F.lit(None).cast("string")))),
    ).drop("items_json")


# --- critic / ranker / fuser (the LLM-ensemble trio: critique N candidate
# responses, rank them, fuse them into one — critic_map.py / ranker_map.py /
# fuser_map.py; candidates arrive as a JSON array column) ---

def _candidates(chunk: pd.DataFrame) -> pd.Series:
    return chunk["responses_json"].fillna("[]")


CRITIC_MAP = RichMap(
    name="critic",
    input_cols=["query", "responses_json"],
    build_prompt=lambda c: (
        "You are a critical evaluator. Critique each candidate response to "
        "the query.\nQuery: " + c["query"].fillna("")
        + "\nCandidates: " + _candidates(c)
    ),
    parse_response=lambda raw: pd.DataFrame({"critique": raw.fillna("")}),
    out_schema="`critique` string",
    mock=lambda p: p.fillna("").map(lambda x: f"critique [{_digest(x)}]"),
)


def _prompt_candidates(p: str) -> list[str]:
    """Candidate list back out of a trio prompt. rsplit: the candidates are
    the LAST marker occurrence, so a query containing the literal marker
    can't confuse the slice; malformed JSON degrades to [] instead of
    failing the whole mapInPandas task (code-review r2)."""
    try:
        cands = json.loads(p.rsplit("Candidates: ", 1)[-1] or "[]")
    except (json.JSONDecodeError, ValueError):
        return []
    if not isinstance(cands, list):
        return []
    return [str(c) for c in cands]


def _ranker_mock(prompts: pd.Series) -> pd.Series:
    """Actually ranks: candidates ordered by (length, text) — deterministic
    and meaningful; emits a JSON list of 0-based indices."""

    def rank(p: str) -> str:
        cands = _prompt_candidates(p)
        order = sorted(range(len(cands)), key=lambda i: (len(cands[i]), cands[i]))
        return json.dumps(order)

    return prompts.fillna("").map(rank)


RANKER_MAP = RichMap(
    name="ranker",
    input_cols=["query", "responses_json"],
    build_prompt=lambda c: (
        "Rank the candidate responses to the query best-first; output a "
        "JSON list of 0-based indices.\nQuery: " + c["query"].fillna("")
        + "\nCandidates: " + _candidates(c)
    ),
    parse_response=lambda raw: pd.DataFrame(
        {"ranking_json": raw.fillna("[]")}
    ),
    out_schema="`ranking_json` string",
    mock=_ranker_mock,
)


def _fuser_mock(prompts: pd.Series) -> pd.Series:
    """Fuses deterministically: longest candidate + a provenance tag."""

    def fuse(p: str) -> str:
        cands = _prompt_candidates(p)
        best = max(cands, key=len) if cands else ""
        return f"{best} [fused {_digest(p)}]"

    return prompts.fillna("").map(fuse)


FUSER_MAP = RichMap(
    name="fuser",
    input_cols=["query", "responses_json"],
    build_prompt=lambda c: (
        "Fuse the candidate responses into one best answer.\nQuery: "
        + c["query"].fillna("") + "\nCandidates: " + _candidates(c)
    ),
    parse_response=lambda raw: pd.DataFrame({"fused_response": raw.fillna("")}),
    out_schema="`fused_response` string",
    mock=_fuser_mock,
)




# --- alpaca self-instruct pair (alpaca_map.py / alpaca_seed_task_map.py) ---

_ALPACA_BLACKLIST = [
    "image", "images", "graph", "graphs", "picture", "pictures", "file",
    "files", "map", "maps", "draw", "plot", "go to", "video", "audio",
    "music", "flowchart", "diagram",
]


def _parse_alpaca_blocks(response: str, num_seed: int) -> list[dict]:
    """AlpacaMap.parse semantics (alpaca_map.py:43-107): the response
    continues a numbered '### N. Instruction/Input/Output' list; each block
    splits into the triple, then self-instruct hygiene filters drop
    too-short/long instructions, multimodal-blacklisted words, 'Write a
    program' leads, punctuation/non-ascii leads; '<noinput>' normalizes to
    empty."""
    raw = f"{num_seed + 1}. Instruction:" + response
    out = []
    for idx, block in enumerate(raw.split("###")):
        n = idx + num_seed + 1
        parts = re.split(rf"{n}\.\s+(Instruction|Input|Output):", block)
        if len(parts) != 7:
            continue
        inst, inp, outp = parts[2].strip(), parts[4].strip(), parts[6].strip()
        if inp.lower() == "<noinput>":
            inp = ""
        words = inst.split()
        if len(words) <= 3 or len(words) > 150:
            continue
        if any(
            re.search(rf"\b{re.escape(w)}\b", inst, re.IGNORECASE)
            for w in _ALPACA_BLACKLIST
        ):
            continue
        if inst.startswith("Write a program"):
            continue
        if not inst or inst[0] in _PUNCT or not inst[0].isascii():
            continue
        out.append({"instruction": inst, "input": inp, "output": outp})
    return out


_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def _alpaca_mock(prompts: pd.Series) -> pd.Series:
    """Emits a numbered continuation with 2 valid blocks, 1 blacklisted and
    1 malformed — so the parse filters are exercised, not just tolerated.
    The continuation numbering starts at 4 (num_seed_instructions=3)."""

    def gen(p: str) -> str:
        d = _digest(p)
        return (
            f" Compose a short story about the token {d} in two sentences.\n"
            f"4. Input:\n<noinput>\n4. Output:\nOnce upon a time, {d} appeared.\n"
            f"###\n5. Instruction:\nDraw a picture of the {d} diagram now.\n"
            f"5. Input:\n<noinput>\n5. Output:\nunreachable\n"
            f"###\n6. Instruction:\nSummarize the passage about {d} in one line.\n"
            f"6. Input:\nThe passage text mentioning {d}.\n"
            f"6. Output:\nIt is about {d}.\n"
            f"###\nmalformed trailing block without numbering"
        )

    return prompts.fillna("").map(gen)


ALPACA_MAP = RichMap(
    name="alpaca",
    input_cols=["alpaca_prompt"],
    build_prompt=lambda c: c["alpaca_prompt"].fillna(""),
    parse_response=lambda raw: pd.DataFrame(
        {
            "generated_json": raw.fillna("").map(
                lambda r: json.dumps(_parse_alpaca_blocks(r, num_seed=3))
            )
        }
    ),
    out_schema="`generated_json` string",
    mock=_alpaca_mock,
)


def alpaca_expand(df: DataFrame) -> DataFrame:
    """Row-expanding tail of AlpacaMap: one output row per parsed
    (instruction, input, output) triple; rows whose generation parsed to
    zero valid triples disappear (reference returns an empty list)."""
    from pyspark.sql import functions as F

    triples = F.from_json(
        F.col("generated_json"),
        "array<struct<instruction: string, input: string, output: string>>",
    )
    return (
        df.withColumn("_t", F.explode(F.coalesce(triples, F.array())))
        .select(
            *[c for c in df.columns if c != "generated_json"],
            F.col("_t.instruction").alias("instruction"),
            F.col("_t.input").alias("input"),
            F.col("_t.output").alias("output"),
        )
    )


def _alpaca_seed_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        return json.dumps(
            {
                "instruction": f"Explain the concept {d} clearly.",
                "input": "",
                "output": f"The concept {d} means the following.",
            }
        )

    return prompts.fillna("").map(gen)


def _alpaca_seed_parse(raw: pd.Series) -> pd.DataFrame:
    # _load_json_field guards non-dict JSON (a list/scalar from a real
    # backend must not raise AttributeError inside the pandas UDF)
    return pd.DataFrame(
        {
            "gen_instruction": raw.fillna("").map(
                lambda r: _load_json_field(r, "instruction")
            ),
            "gen_input": raw.fillna("").map(lambda r: _load_json_field(r, "input")),
            "gen_output": raw.fillna("").map(lambda r: _load_json_field(r, "output")),
        }
    )


ALPACA_SEED_MAP = RichMap(
    name="alpaca_seed",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: c["seed_prompt"].fillna(""),
    parse_response=_alpaca_seed_parse,
    out_schema=(
        "`gen_instruction` string, `gen_input` string, `gen_output` string"
    ),
    mock=_alpaca_seed_mock,
)


def alpaca_seed_expand(
    df: DataFrame,
    instruction_col: str = "instruction",
    input_col: str = "input",
    output_col: str = "output",
) -> DataFrame:
    """AlpacaSeedTaskMap.parse returns [generated_row, original_row] — both
    survive (alpaca_seed_task_map.py:27-43). Union the generated triple
    (overwriting the task columns) with the originals."""
    from pyspark.sql import functions as F

    keep = [
        c for c in df.columns
        if c not in ("gen_instruction", "gen_input", "gen_output")
    ]
    generated = df.select(
        *[c for c in keep if c not in (instruction_col, input_col, output_col)],
        F.col("gen_instruction").alias(instruction_col),
        F.col("gen_input").alias(input_col),
        F.col("gen_output").alias(output_col),
    )
    original = df.select(
        *[c for c in keep if c not in (instruction_col, input_col, output_col)],
        F.col(instruction_col), F.col(input_col), F.col(output_col),
    )
    return generated.unionByName(original)


# --- generator (generator_map.py: ListMap prompt, list stays ONE row) ---

GENERATOR_MAP = RichMap(
    name="generator",
    input_cols=["request"],
    build_prompt=_list_prompt,
    parse_response=lambda raw: pd.DataFrame(
        {"generated": raw.fillna("[]").map(_load_str_list)}
    ),
    out_schema="`generated` array<string>",
    mock=_list_mock,
)


# --- scorer (scorer_map.py: 1-100 score + reasoning, structured) ---

def _scorer_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        score = int(d[:2], 16) % 100 + 1
        return json.dumps(
            {"response": score, "reasoning": f"scored by rubric [{d}]"}
        )

    return prompts.fillna("").map(gen)


def _scorer_parse(raw: pd.Series) -> pd.DataFrame:
    def load(r: str) -> tuple[float, str]:
        try:
            d = json.loads(r)
            return float(d["response"]), str(d.get("reasoning", ""))
        except (json.JSONDecodeError, ValueError, KeyError, TypeError):
            return float("nan"), ""

    pairs = raw.fillna("").map(load)
    return pd.DataFrame(
        {
            "score": pairs.map(lambda t: t[0]),
            "classifier_reasoning": pairs.map(lambda t: t[1]),
        }
    )


SCORER_MAP = RichMap(
    name="scorer",
    input_cols=["query", "response"],
    build_prompt=lambda c: (
        "Score the response to the query from 1 to 100 and explain.\nQuery: "
        + c["query"].fillna("") + "\nResponse: " + c["response"].fillna("")
    ),
    parse_response=_scorer_parse,
    out_schema="`score` double, `classifier_reasoning` string",
    mock=_scorer_mock,
)


# --- test_cases (test_case_map.py: paired stdin/stdout lists) ---

def _test_cases_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        k = int(d[:2], 16) % 3 + 2
        return json.dumps(
            {
                "test_inputs": [f"in-{d}-{j}" for j in range(k)],
                "test_outputs": [f"out-{d}-{j}" for j in range(k)],
            }
        )

    return prompts.fillna("").map(gen)


def _test_cases_parse(raw: pd.Series) -> pd.DataFrame:
    def load(r: str, key: str) -> list[str]:
        try:
            return [str(x) for x in json.loads(r)[key]]
        except (json.JSONDecodeError, ValueError, KeyError, TypeError):
            return []

    return pd.DataFrame(
        {
            "test_inputs": raw.fillna("").map(lambda r: load(r, "test_inputs")),
            "test_outputs": raw.fillna("").map(lambda r: load(r, "test_outputs")),
        }
    )


TEST_CASE_MAP = RichMap(
    name="test_cases",
    input_cols=["problem"],
    build_prompt=lambda c: (
        "Write test cases for this problem:\n\n" + c["problem"].fillna("")
    ),
    parse_response=_test_cases_parse,
    out_schema="`test_inputs` array<string>, `test_outputs` array<string>",
    mock=_test_cases_mock,
)


# --- unnatural_instructions (structured instruction/input/constraints) ---

def _unnatural_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        return json.dumps(
            {
                "instruction": f"Classify the sentiment of sample {d}.",
                "input": f"Sample text {d}.",
                "constraints": "The output should be positive or negative.",
            }
        )

    return prompts.fillna("").map(gen)


def _unnatural_parse(raw: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            k: raw.fillna("").map(lambda r, k=k: _load_json_field(r, k))
            for k in ("instruction", "input", "constraints")
        }
    )


UNNATURAL_INSTRUCTIONS_MAP = RichMap(
    name="unnatural_instructions",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: c["seed_prompt"].fillna(""),
    parse_response=_unnatural_parse,
    out_schema="`instruction` string, `input` string, `constraints` string",
    mock=_unnatural_mock,
)


# --- url_classify (WebInstruct/url_classify_map.py: last word yes/no) ---

_EDU_HINT = re.compile(
    r"(?i)(edu|school|university|academy|learn|course|tutorial|math|khan)"
)


def _url_classify_mock(prompts: pd.Series) -> pd.Series:
    """Actually classifies: educational iff the domain carries an
    education-y token (deterministic stand-in for the LLM heuristic)."""

    def gen(p: str) -> str:
        url = p.rsplit("Domain: ", 1)[-1]
        verdict = "yes" if _EDU_HINT.search(url) else "no"
        return f"Considered the domain [{_digest(p)}]. {verdict}"

    return prompts.fillna("").map(gen)


def _url_classify_parse(raw: pd.Series) -> pd.DataFrame:
    last = raw.fillna("").str.strip().str.split().str[-1].str.lower()
    return pd.DataFrame(
        {
            "url_classification": last == "yes",
            "url_classification_full": raw.fillna(""),
        }
    )


URL_CLASSIFY_MAP = RichMap(
    name="url_classify",
    input_cols=["url"],
    build_prompt=lambda c: (
        "Classify whether this domain hosts educational content. The last "
        "word you send must be yes or no.\nDomain: " + c["url"].fillna("")
    ),
    parse_response=_url_classify_parse,
    out_schema="`url_classification` boolean, `url_classification_full` string",
    mock=_url_classify_mock,
)


# --- gemini_ocr (GeminiOCR/gemini_ocr.py: page bytes -> extracted text) ---

def _ocr_prompt(chunk: pd.DataFrame) -> pd.Series:
    """The real map attaches the PDF bytes as a file part; the prompt
    column here carries a deterministic surrogate (page number + content
    digest) since no OCR model/codec exists in this environment — the
    bytes themselves flow through Arrow untouched."""
    return pd.Series(
        [
            f"OCR page {n}: {hashlib.md5(bytes(b or b'')).hexdigest()}"
            for b, n in zip(chunk["page_bytes"], chunk["page_number"])
        ],
        index=chunk.index,
    )


GEMINI_OCR_MAP = RichMap(
    name="gemini_ocr",
    input_cols=["page_bytes", "page_number"],
    build_prompt=_ocr_prompt,
    parse_response=lambda raw: pd.DataFrame(
        {"output_extraction": raw.fillna("")}
    ),
    out_schema="`output_extraction` string",
    mock=lambda p: p.fillna("").map(
        lambda x: f"# Extracted text\n[{_digest(x)}] {x.split(': ')[-1]}"
    ),
)


# --- webinstruct_extract_qa (WebInstruct/extract_qa_map.py, row-expanding) ---

# explicit [ \t] (not \s — would span newlines and drift from the RE2
# oracle pattern; repo dialect rule)
_QA_PAT = re.compile(r"Q:[ \t]*([^\n]+)\nA:[ \t]*([^\n]+)")


def _extract_qa_mock(prompts: pd.Series) -> pd.Series:
    """Actually extracts: 'Q: ...\\nA: ...' pairs found in the document body
    become the structured pair list (qa_exists=False when none)."""

    def gen(p: str) -> str:
        pairs = [
            {"question": q.strip(), "answer": a.strip()}
            for q, a in _QA_PAT.findall(p)
        ]
        return json.dumps({"qa_exists": bool(pairs), "extracted_qa_pairs": pairs})

    return prompts.fillna("").map(gen)


EXTRACT_QA_MAP = RichMap(
    name="webinstruct_extract_qa",
    input_cols=["text"],
    build_prompt=lambda c: c["text"].fillna(""),
    parse_response=lambda raw: pd.DataFrame({"qa_json": raw.fillna("")}),
    out_schema="`qa_json` string",
    mock=_extract_qa_mock,
)


def extract_qa_expand(df: DataFrame) -> DataFrame:
    """Row-expanding tail: one row per extracted (question, answer); rows
    with qa_exists=false vanish (extract_qa_map.py:62-76)."""
    from pyspark.sql import functions as F

    pairs = F.from_json(
        F.col("qa_json"),
        "struct<qa_exists: boolean, "
        "extracted_qa_pairs: array<struct<question: string, answer: string>>>",
    )
    return (
        df.withColumn(
            "_qa", F.explode(F.coalesce(pairs["extracted_qa_pairs"], F.array()))
        )
        .select(
            *[c for c in df.columns if c != "qa_json"],
            F.col("_qa.question").alias("question"),
            F.col("_qa.answer").alias("answer"),
        )
    )


# --- AutoEvolInstruct trio (evolve instruction / evolve the evolver /
# analyze the trajectory — AutoEvolInstruct/*.py) ---

def _evol_llm_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        base = p.rsplit("#Instruction#:", 1)[-1].strip()
        evolved = (
            f"{base} Additionally, justify each step and handle the edge "
            f"case {d}."
        )
        return json.dumps(
            {
                "methods_list": "add constraints; require justification",
                "plan": f"extend the task with edge case {d}",
                "rewritten_instruction": evolved,
                "finally_rewritten_instruction": evolved,
            }
        )

    return prompts.fillna("").map(gen)


def _evol_llm_parse(raw: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "methods_list": raw.fillna("").map(
                lambda r: _load_json_field(r, "methods_list")
            ),
            "plan": raw.fillna("").map(lambda r: _load_json_field(r, "plan")),
            "evolved_instruction": raw.fillna("").map(
                lambda r: _load_json_field(r, "finally_rewritten_instruction")
            ),
        }
    )


AUTO_EVOL_LLM_MAP = RichMap(
    name="auto_evol_llm",
    input_cols=["evol_prompt", "instruction"],
    build_prompt=lambda c: (
        c["evol_prompt"].fillna("") + "\n#Instruction#:\n"
        + c["instruction"].fillna("")
    ),
    parse_response=_evol_llm_parse,
    out_schema=(
        "`methods_list` string, `plan` string, `evolved_instruction` string"
    ),
    mock=_evol_llm_mock,
)


EVOL_PROMPT_EVOLVER_MAP = RichMap(
    name="auto_evol_prompt_evolver",
    input_cols=["feedback", "evol_prompt"],
    build_prompt=lambda c: (
        c["feedback"].fillna("")
        + "\nI will provide you with the method for evolving the above "
        "instructions. Optimize this method based on the feedback without "
        "harming other cases.\nHere is the method:\n"
        + c["evol_prompt"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {"evol_prompt_evolved": raw.fillna("")}
    ),
    out_schema="`evol_prompt_evolved` string",
    mock=lambda p: p.fillna("").map(
        lambda x: (
            "Evolve the instruction by adding one reasoning constraint and "
            f"one verification step [{_digest(x)}]."
        )
    ),
)


def _trajectory_mock(prompts: pd.Series) -> pd.Series:
    """Actually analyzes: a stage whose instruction got SHORTER than its
    predecessor 'failed to evolve' — deterministic and meaningful."""

    def gen(p: str) -> str:
        stages = re.findall(r"Instruction \d+: ([^\n]*)", p)
        failed = [
            str(i + 1)
            for i in range(1, len(stages))
            if len(stages[i]) < len(stages[i - 1])
        ]
        if failed:
            return (
                "Failed cases: " + ", ".join(failed)
                + " — complexity regressed at these stages."
            )
        return "All stages increased in complexity."

    return prompts.fillna("").map(gen)


def _trajectory_prompt(chunk: pd.DataFrame) -> pd.Series:
    def fmt(r: str) -> str:
        try:
            stages = json.loads(r or "[]")
        except (json.JSONDecodeError, ValueError):
            stages = []
        head = (
            "Identify cases that failed to evolve (each stage must increase "
            "complexity over the previous).\n"
        )
        return head + "".join(
            f"Instruction {i + 1}: {s}\n" for i, s in enumerate(stages)
        )

    return chunk["evolved_instructions_json"].fillna("[]").map(fmt)


TRAJECTORY_ANALYSIS_MAP = RichMap(
    name="auto_evol_trajectory_analysis",
    input_cols=["evolved_instructions_json"],
    build_prompt=_trajectory_prompt,
    parse_response=lambda raw: pd.DataFrame({"feedback": raw.fillna("")}),
    out_schema="`feedback` string",
    mock=_trajectory_mock,
)




# --- Metamath family (Metamath/*.py: question inversion / rephrase /
# self-verification / solving loops) ---

_NUM_RE = re.compile(r"\b\d+(?:\.\d+)?\b")


def _inverse_q_mock(prompts: pd.Series) -> pd.Series:
    """Actually inverts: each numeric quantity in the question becomes one
    inverse pair — the quantity replaced by X, the answer being the
    quantity (inverse_question_map.py contract)."""

    def gen(p: str) -> str:
        q = p.rsplit("Question: ", 1)[-1]
        pairs = []
        for mobj in _NUM_RE.finditer(q):
            pairs.append(
                {
                    "surrounding_context": q[
                        max(0, mobj.start() - 15): mobj.end() + 15
                    ],
                    "inverse_question": q[: mobj.start()] + "X" + q[mobj.end():],
                    "inverse_answer": mobj.group(0),
                }
            )
        return json.dumps({"quantities": pairs})

    return prompts.fillna("").map(gen)


METAMATH_INVERSE_QUESTION_MAP = RichMap(
    name="metamath_inverse_question",
    input_cols=["question"],
    build_prompt=lambda c: (
        "Extract numerical quantities and invert the question by replacing "
        "each with X.\nQuestion: " + c["question"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame({"inverse_json": raw.fillna("")}),
    out_schema="`inverse_json` string",
    mock=_inverse_q_mock,
)


def metamath_inverse_expand(df: DataFrame) -> DataFrame:
    """One row per extracted quantity (inverse_question_map.py parse)."""
    from pyspark.sql import functions as F

    parsed = F.from_json(
        F.col("inverse_json"),
        "struct<quantities: array<struct<surrounding_context: string, "
        "inverse_question: string, inverse_answer: string>>>",
    )
    return (
        df.withColumn("_q", F.explode(F.coalesce(parsed["quantities"], F.array())))
        .select(
            *[c for c in df.columns if c != "inverse_json"],
            F.col("_q.inverse_question").alias("inverse_question"),
            F.col("_q.inverse_answer").alias("inverse_answer"),
        )
    )


METAMATH_REPHRASE_MAP = RichMap(
    name="metamath_rephrase_question",
    input_cols=["question"],
    build_prompt=lambda c: (
        "Rephrase the question, keeping its mathematical content.\n"
        "Question: " + c["question"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {"rephrased_question": raw.fillna("")}
    ),
    out_schema="`rephrased_question` string",
    mock=lambda p: p.fillna("").map(
        lambda x: "Consider the following: "
        + x.rsplit("Question: ", 1)[-1].rstrip(".?")
        + f" — what is the result? [{_digest(x)}]"
    ),
)


METAMATH_SELF_VERIFICATION_MAP = RichMap(
    name="metamath_self_verification",
    input_cols=["question", "answer"],
    build_prompt=lambda c: (
        "Rewrite the question and its answer as one declarative statement."
        "\nQuestion: " + c["question"].fillna("")
        + "\nAnswer: " + c["answer"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {"declarative_statement": raw.fillna("")}
    ),
    out_schema="`declarative_statement` string",
    mock=lambda p: p.fillna("").map(
        lambda x: "It is the case that the answer to \""
        + x.rsplit("Question: ", 1)[-1].split("\nAnswer: ")[0]
        + "\" is " + x.rsplit("Answer: ", 1)[-1] + "."
    ),
)


def _solve_answer_mock(prompts: pd.Series) -> pd.Series:
    """Deterministic 'solver': returns the ground-truth answer when the
    prompt digest is even (a correct attempt) and a perturbed one when odd
    — so the downstream match/filter logic is exercised both ways."""

    def gen(p: str) -> str:
        truth = p.rsplit("Ground truth: ", 1)[-1].strip()
        d = _digest(p)
        ans = truth if int(d[0], 16) % 2 == 0 else truth + "0"
        return json.dumps(
            {"solution": f"Worked through the steps [{d}].", "final_answer": ans}
        )

    return prompts.fillna("").map(gen)


def _solve_parse(raw: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "solution": raw.fillna("").map(
                lambda r: _load_json_field(r, "solution")
            ),
            "predicted_answer": raw.fillna("").map(
                lambda r: _load_json_field(r, "final_answer")
            ),
        }
    )


METAMATH_SOLVE_INVERSE_MAP = RichMap(
    name="metamath_solve_inverse",
    input_cols=["inverse_question", "inverse_answer"],
    build_prompt=lambda c: (
        "Solve for X.\nQuestion: " + c["inverse_question"].fillna("")
        + "\nGround truth: " + c["inverse_answer"].fillna("")
    ),
    parse_response=_solve_parse,
    out_schema="`solution` string, `predicted_answer` string",
    mock=_solve_answer_mock,
)


METAMATH_SOLVE_REPHRASED_MAP = RichMap(
    name="metamath_solve_rephrased",
    input_cols=["rephrased_question", "answer"],
    build_prompt=lambda c: (
        "Solve the problem.\nQuestion: " + c["rephrased_question"].fillna("")
        + "\nGround truth: " + c["answer"].fillna("")
    ),
    parse_response=_solve_parse,
    out_schema="`solution` string, `predicted_answer` string",
    mock=_solve_answer_mock,
)


METAMATH_PROBLEM_CLONE_MAP = RichMap(
    name="metamath_problem_clone",
    input_cols=["question"],
    build_prompt=lambda c: (
        "Write a NEW problem similar in structure and difficulty to this "
        "one.\nQuestion: " + c["question"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame({"cloned_question": raw.fillna("")}),
    out_schema="`cloned_question` string",
    mock=lambda p: p.fillna("").map(
        lambda x: re.sub(
            _NUM_RE,
            lambda m: str(int(float(m.group(0))) + 1),
            x.rsplit("Question: ", 1)[-1],
        )
        + f" [variant {_digest(x)}]"
    ),
)


# --- AutoVerification (AutoVerification/*.py: which of N responses agree) ---

_FINAL_ANSWER_RE = re.compile(r"(?:final answer|answer)[:\s]*([^\n.]+)", re.I)


def _same_mock(prompts: pd.Series) -> pd.Series:
    """Actually verifies: extracts each candidate's final answer (tail
    'answer: x' marker, else last token), groups by value, returns the
    indices of the largest agreeing group — the consistency-vote the real
    map asks the LLM for."""

    def gen(p: str) -> str:
        cands = _prompt_candidates(p)
        finals = []
        for cand in cands:
            m = _FINAL_ANSWER_RE.search(cand)
            finals.append(
                (m.group(1) if m else (cand.split()[-1] if cand.split() else ""))
                .strip().lower()
            )
        groups: dict[str, list[int]] = {}
        for i, f in enumerate(finals):
            groups.setdefault(f, []).append(i)
        best = max(groups.values(), key=lambda g: (len(g), -g[0]), default=[])
        return json.dumps(
            {
                "response": [str(i) for i in best],
                "reasoning": f"largest agreeing group of {len(cands)} candidates",
            }
        )

    return prompts.fillna("").map(gen)


def _same_parse(raw: pd.Series) -> pd.DataFrame:
    def load(r: str) -> list[int]:
        try:
            return [int(x) for x in json.loads(r)["response"]]
        except (json.JSONDecodeError, ValueError, KeyError, TypeError):
            return []

    return pd.DataFrame(
        {
            "agreeing_indices": raw.fillna("").map(load),
            "verification_reasoning": raw.fillna("").map(
                lambda r: _load_json_field(r, "reasoning")
            ),
        }
    )


def _make_same_map(name: str, subject: str) -> RichMap:
    return RichMap(
        name=name,
        input_cols=["question", "responses_json"],
        build_prompt=lambda c: (
            f"Given the {subject} question and candidate responses, return "
            "the indices of responses whose final answers agree.\nQuestion: "
            + c["question"].fillna("")
            + "\nCandidates: " + c["responses_json"].fillna("[]")
        ),
        parse_response=_same_parse,
        out_schema=(
            "`agreeing_indices` array<int>, `verification_reasoning` string"
        ),
        mock=_same_mock,
    )


MATH_SAME_MAP = _make_same_map("math_same", "math")
CODE_SAME_MAP = _make_same_map("code_same", "code")
SCIENCE_SAME_MAP = _make_same_map("science_same", "science")


# --- SkyT1 difficulty variants (ICPC / science rubrics, same 1-10 parse) ---

def _make_difficulty_variant(name: str, rubric: str) -> RichMap:
    return RichMap(
        name=name,
        input_cols=["problem"],
        build_prompt=lambda c: (
            f"Grade the difficulty of this {rubric} problem from 1 to 10 "
            "and explain. Respond as JSON {\"difficulty\": n, \"reasoning\":"
            " ...}.\nProblem: " + c["problem"].fillna("")
        ),
        parse_response=_difficulty_parse,
        out_schema="`difficulty` int, `difficulty_reasoning` string",
        mock=_difficulty_mock,
    )


SKY_T1_ICPC_DIFFICULTY_MAP = _make_difficulty_variant(
    "sky_t1_ICPC_difficulty", "competitive-programming (ICPC)"
)
SKY_T1_SCIENCE_DIFFICULTY_MAP = _make_difficulty_variant(
    "sky_t1_science_difficulty", "science"
)


# --- DeepSeekR1 judge + code-golf extractor ---

def _deepseek_judge_mock(prompts: pd.Series) -> pd.Series:
    """Actually judges: correct iff the ground truth string occurs in the
    attempt (same posture as the judge map), verdict boxed."""

    def gen(p: str) -> str:
        m = re.search(r"Ground truth: (.*)\nAttempt: (.*)$", p, re.S)
        ok = bool(m) and m.group(1).strip() != "" and m.group(1).strip() in m.group(2)
        word = "correct" if ok else "incorrect"
        return f"Checked the attempt [{_digest(p)}]. \\boxed{{{word}}}"

    return prompts.fillna("").map(gen)


def _deepseek_judge_parse(raw: pd.Series) -> pd.DataFrame:
    boxed = raw.fillna("").str.extract(r"\\boxed\{(\w+)\}", expand=False)
    return pd.DataFrame(
        {
            "correct": boxed == "correct",
            "judge_reasoning": raw.fillna(""),
        }
    )


DEEPSEEK_JUDGE_MAP = RichMap(
    name="deepseek_judge",
    input_cols=["question", "golden_answer", "attempt"],
    build_prompt=lambda c: (
        "Judge whether the attempt answers the question correctly; end "
        "with \\boxed{correct} or \\boxed{incorrect}.\nQuestion: "
        + c["question"].fillna("")
        + "\nGround truth: " + c["golden_answer"].fillna("")
        + "\nAttempt: " + c["attempt"].fillna("")
    ),
    parse_response=_deepseek_judge_parse,
    out_schema="`correct` boolean, `judge_reasoning` string",
    mock=_deepseek_judge_mock,
)


_CODE_BLOCK_RE = re.compile(r"```(?:python)?\n(.*?)```", re.S)


def _code_golf_mock(prompts: pd.Series) -> pd.Series:
    """Actually extracts: wraps the solution's code block as a runnable
    stdin/stdout script (code_golf_extractor.py contract)."""

    def gen(p: str) -> str:
        m = _CODE_BLOCK_RE.search(p)
        body = m.group(1).strip() if m else "pass"
        return (
            "```python\nimport sys\n" + body
            + "\nfor line in sys.stdin: print(run(line.rstrip()))\n```"
        )

    return prompts.fillna("").map(gen)


CODE_GOLF_EXTRACTOR_MAP = RichMap(
    name="code_golf_extractor",
    input_cols=["solution"],
    build_prompt=lambda c: (
        "Rewrite this code-golf solution as a Python script reading stdin "
        "and printing results.\n" + c["solution"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {
            "code": raw.fillna("").map(
                lambda r: (_CODE_BLOCK_RE.search(r).group(1).strip()
                           if _CODE_BLOCK_RE.search(r) else r.strip())
            )
        }
    ),
    out_schema="`code` string",
    mock=_code_golf_mock,
)


# --- Airoboros family (contextual / counterfactual / experience / list_qa) ---

def _contextual_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        return json.dumps(
            {
                "prompts": [
                    {
                        "text_blocks": [
                            {
                                "metadata": {"source": f"doc-{d}"},
                                "content": f"Context paragraph about {d}.",
                            }
                        ],
                        "instruction": f"Using the context, summarize {d}.",
                    }
                ]
            }
        )

    return prompts.fillna("").map(gen)


def _contextual_parse(raw: pd.Series) -> pd.DataFrame:
    def load(r: str) -> tuple[str, str]:
        try:
            p = json.loads(r)["prompts"][0]
            ctx = "\n".join(b["content"] for b in p["text_blocks"])
            return ctx, str(p["instruction"])
        except (json.JSONDecodeError, ValueError, KeyError, IndexError, TypeError):
            return "", ""

    pairs = raw.fillna("").map(load)
    return pd.DataFrame(
        {
            "context": pairs.map(lambda t: t[0]),
            "contextual_instruction": pairs.map(lambda t: t[1]),
        }
    )


CONTEXTUAL_INSTRUCTIONS_MAP = RichMap(
    name="contextual_instructions",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: c["seed_prompt"].fillna(""),
    parse_response=_contextual_parse,
    out_schema="`context` string, `contextual_instruction` string",
    mock=_contextual_mock,
)


COUNTERFACTUAL_CONTEXTUAL_MAP = RichMap(
    name="counterfactual_contextual_instructions",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: (
        "Generate a context block containing a deliberately FALSE premise "
        "plus an instruction that can only be answered from that context.\n"
        + c["seed_prompt"].fillna("")
    ),
    parse_response=_contextual_parse,
    out_schema="`context` string, `contextual_instruction` string",
    mock=_contextual_mock,
)


def _experience_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        return json.dumps(
            {
                "setting": f"A quiet observatory at dusk [{d}].",
                "instruction": f"Describe what you observe in scene {d}.",
                "experience": f"You watch the sky over scene {d} darken slowly.",
            }
        )

    return prompts.fillna("").map(gen)


def _experience_parse(raw: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "experience_instruction": raw.fillna("").map(
                lambda r: _load_json_field(r, "instruction")
            ),
            "experience_response": raw.fillna("").map(
                lambda r: _load_json_field(r, "experience")
            ),
        }
    )


EXPERIENCE_MAP = RichMap(
    name="experience",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: c["seed_prompt"].fillna(""),
    parse_response=_experience_parse,
    out_schema="`experience_instruction` string, `experience_response` string",
    mock=_experience_mock,
)


def _list_qa_mock(prompts: pd.Series) -> pd.Series:
    """Actually answers from context: items are the comma-separated values
    following 'items:' in the context."""

    def gen(p: str) -> str:
        m = re.search(r"items:\s*([^\n]+)", p, re.I)
        items = [x.strip() for x in (m.group(1).split(",") if m else []) if x.strip()]
        return json.dumps(items)

    return prompts.fillna("").map(gen)


LIST_QA_MAP = RichMap(
    name="list_qa",
    input_cols=["context", "question"],
    build_prompt=lambda c: (
        "Answer the question as a JSON list using only the context.\n"
        "Context: " + c["context"].fillna("")
        + "\nQuestion: " + c["question"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {"answer_list": raw.fillna("[]").map(_load_str_list)}
    ),
    out_schema="`answer_list` array<string>",
    mock=_list_qa_mock,
)


# --- open_gpt + WebInstruct classify/revise ---

def _open_gpt_mock(prompts: pd.Series) -> pd.Series:
    def gen(p: str) -> str:
        d = _digest(p)
        return json.dumps(
            {
                "instruction": f"Discuss the topic {d} with a patient.",
                "response": f"Certainly — regarding {d}, here is an overview.",
            }
        )

    return prompts.fillna("").map(gen)


OPEN_GPT_MAP = RichMap(
    name="open_gpt",
    input_cols=["seed_prompt"],
    build_prompt=lambda c: c["seed_prompt"].fillna(""),
    parse_response=lambda raw: pd.DataFrame(
        {
            "instruction": raw.fillna("").map(
                lambda r: _load_json_field(r, "instruction")
            ),
            "response": raw.fillna("").map(
                lambda r: _load_json_field(r, "response")
            ),
        }
    ),
    out_schema="`instruction` string, `response` string",
    mock=_open_gpt_mock,
)


_EDU_DOMAINS = [
    "mathematics", "physics", "chemistry", "biology", "engineering",
    "computer science", "economics", "other",
]

_DOMAIN_HINTS = {
    "mathematics": re.compile(r"(?i)(math|equation|integral|algebra|geometry)"),
    "physics": re.compile(r"(?i)(physics|velocity|quantum|force|energy)"),
    "chemistry": re.compile(r"(?i)(chemi|molecule|reaction|acid)"),
    "biology": re.compile(r"(?i)(bio|cell|gene|organism)"),
    "engineering": re.compile(r"(?i)(engineer|circuit|mechanical)"),
    "computer science": re.compile(r"(?i)(algorithm|program|software|code)"),
    "economics": re.compile(r"(?i)(econom|market|price|demand)"),
}


def _classify_domain_mock(prompts: pd.Series) -> pd.Series:
    """Actually classifies by keyword family; 'other' when nothing hits.
    Scans only the document body (after the instruction line — which
    itself names every domain)."""

    def gen(p: str) -> str:
        body = p.split(".\n", 1)[-1]
        for dom, pat in _DOMAIN_HINTS.items():
            if pat.search(body):
                return dom
        return "other"

    return prompts.fillna("").map(gen)


CLASSIFY_EDUCATIONAL_DOMAIN_MAP = RichMap(
    name="webinstruct_classify_educational_domain",
    input_cols=["text"],
    build_prompt=lambda c: (
        "Classify the educational domain of this document as one of: "
        + ", ".join(_EDU_DOMAINS) + ".\n" + c["text"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {
            "educational_domain": raw.fillna("").str.strip().str.lower().map(
                lambda d: d if d in _EDU_DOMAINS else "other"
            )
        }
    ),
    out_schema="`educational_domain` string",
    mock=_classify_domain_mock,
)


REVISE_QA_MAP = RichMap(
    name="webinstruct_revise_qa",
    input_cols=["question", "answer"],
    build_prompt=lambda c: (
        "Revise the question and answer for clarity and completeness; "
        "respond as JSON {\"question\": ..., \"answer\": ...}.\nQuestion: "
        + c["question"].fillna("") + "\nAnswer: " + c["answer"].fillna("")
    ),
    parse_response=lambda raw: pd.DataFrame(
        {
            "revised_question": raw.fillna("").map(
                lambda r: _load_json_field(r, "question")
            ),
            "revised_answer": raw.fillna("").map(
                lambda r: _load_json_field(r, "answer")
            ),
        }
    ),
    out_schema="`revised_question` string, `revised_answer` string",
    mock=lambda p: p.fillna("").map(
        lambda x: json.dumps(
            {
                "question": x.rsplit("Question: ", 1)[-1]
                .split("\nAnswer: ")[0].strip().rstrip("?") + "? (revised)",
                "answer": x.rsplit("Answer: ", 1)[-1].strip()
                + " In summary, this fully addresses the question.",
            }
        )
    ),
)


MAPS: dict[str, RichMap] = {
    m.name: m
    for m in (
        JUDGE_MAP, DIFFICULTY_MAP, EXTRACT_ANSWER_MAP, REASON_MAP,
        CHAT_MAP, BINARY_CLASSIFIER_MAP, LIST_MAP,
        CRITIC_MAP, RANKER_MAP, FUSER_MAP,
        ALPACA_MAP, ALPACA_SEED_MAP, GENERATOR_MAP, SCORER_MAP,
        TEST_CASE_MAP, UNNATURAL_INSTRUCTIONS_MAP, URL_CLASSIFY_MAP,
        GEMINI_OCR_MAP, EXTRACT_QA_MAP,
        AUTO_EVOL_LLM_MAP, EVOL_PROMPT_EVOLVER_MAP, TRAJECTORY_ANALYSIS_MAP,
        METAMATH_INVERSE_QUESTION_MAP, METAMATH_REPHRASE_MAP,
        METAMATH_SELF_VERIFICATION_MAP, METAMATH_SOLVE_INVERSE_MAP,
        METAMATH_SOLVE_REPHRASED_MAP, METAMATH_PROBLEM_CLONE_MAP,
        MATH_SAME_MAP, CODE_SAME_MAP, SCIENCE_SAME_MAP,
        SKY_T1_ICPC_DIFFICULTY_MAP, SKY_T1_SCIENCE_DIFFICULTY_MAP,
        DEEPSEEK_JUDGE_MAP, CODE_GOLF_EXTRACTOR_MAP,
        CONTEXTUAL_INSTRUCTIONS_MAP, COUNTERFACTUAL_CONTEXTUAL_MAP,
        EXPERIENCE_MAP, LIST_QA_MAP,
        OPEN_GPT_MAP, CLASSIFY_EDUCATIONAL_DOMAIN_MAP, REVISE_QA_MAP,
        DEEPSEEK_REASONER_MAP, KLUSTER_DEEPSEEK_REASONER_MAP,
        CLAUDE_REASONER_MAP, GROK_REASONER_MAP, TOGETHER_QWEN_MAP,
    )
}
# registry-key alias: the reference registers ExtractMathAnswerMap as
# 'metamath_extract_math_answer' (map_registry.py:100)
MAPS["metamath_extract_math_answer"] = EXTRACT_ANSWER_MAP


def apply_map(
    df: DataFrame,
    rich_map: RichMap,
    backend: Callable[[pd.Series], pd.Series] | None = None,
    batch_size: int = 256,
    n_repeat: int = 1,
    merge_shards: int | None = None,
) -> DataFrame:
    """Run a RichMap over every row: chunk → prompts → backend → parsed
    output columns appended (mapInPandas; same harness economics as
    operators/completions.py — per-executor batch = rate-limit unit).

    ``n_repeat`` duplicates every input row n times BEFORE the map
    (completions_operator.py:53,61-65 n_repeat -> repeat_dataset) via a
    narrow explode — with a sampling backend each copy draws its own
    completion; with the deterministic mock the copies are value-checkable
    duplicates. ``merge_shards`` coalesces the OUTPUT to that many
    partitions (the reference's merge_shards=True collapses shards into
    one dataset; an int keeps the policy scale-tunable — 1 reproduces the
    reference)."""
    backend = backend or rich_map.mock
    missing = [c for c in rich_map.input_cols if c not in df.columns]
    if missing:
        raise ValueError(f"map {rich_map.name}: missing input columns {missing}")
    if n_repeat < 1:
        raise ValueError(f"n_repeat must be >= 1, got {n_repeat}")
    if n_repeat > 1:
        from open_thoughts_spark.operators.relational import repeat_dataset

        df = repeat_dataset(df, n_repeat)
    schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in df.columns
    )
    schema += ", " + rich_map.out_schema

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[i : i + batch_size].copy()
                prompts = rich_map.build_prompt(chunk)
                parsed = rich_map.parse_response(backend(prompts))
                for col in parsed.columns:
                    chunk[col] = parsed[col].to_numpy()
                yield chunk

    out = df.mapInPandas(_runner, schema=schema)
    if merge_shards:
        out = out.coalesce(merge_shards)
    return out
