"""Representative completions prompt/parse maps — engine/maps parity.

The reference ships ~60 map classes, each a (prompt builder, response
parser) pair run through the completions operator
(/root/reference/open_thoughts_3/engine/maps/map_registry.py:1-112).
Twenty-two map shapes are reproduced here against the mock backend (the
MOCK_VERIFY test posture — open_thoughts/math/judge.py:46-49), covering the
registry's families: judge/scorer/critic/ranker/fuser evaluation, chat +
reasoner, structured extraction (math answer, WebInstruct QA), list/
generator, self-instruct (alpaca + seed tasks + unnatural instructions),
the AutoEvolInstruct evolve/evolver/trajectory trio, difficulty grading,
test-case synthesis, URL classification and the OCR-shaped bytes->text
map. Representative of the first four:

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
    def one(r: str, key: str) -> str:
        try:
            return str(json.loads(r).get(key, ""))
        except (json.JSONDecodeError, ValueError):
            return ""

    return pd.DataFrame(
        {
            "gen_instruction": raw.fillna("").map(lambda r: one(r, "instruction")),
            "gen_input": raw.fillna("").map(lambda r: one(r, "input")),
            "gen_output": raw.fillna("").map(lambda r: one(r, "output")),
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
        {
            "generated": raw.fillna("[]").map(
                lambda r: [str(x) for x in json.loads(r)]
                if r.startswith("[") else []
            )
        }
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
    def one(r: str, key: str) -> str:
        try:
            return str(json.loads(r).get(key, ""))
        except (json.JSONDecodeError, ValueError):
            return ""

    return pd.DataFrame(
        {
            k: raw.fillna("").map(lambda r, k=k: one(r, k))
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

_QA_PAT = re.compile(r"Q:\s*([^\n]+)\nA:\s*([^\n]+)")


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
    def load(r: str, key: str) -> str:
        try:
            return str(json.loads(r).get(key, ""))
        except (json.JSONDecodeError, ValueError):
            return ""

    return pd.DataFrame(
        {
            "methods_list": raw.fillna("").map(lambda r: load(r, "methods_list")),
            "plan": raw.fillna("").map(lambda r: load(r, "plan")),
            "evolved_instruction": raw.fillna("").map(
                lambda r: load(r, "finally_rewritten_instruction")
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
    )
}


def apply_map(
    df: DataFrame,
    rich_map: RichMap,
    backend: Callable[[pd.Series], pd.Series] | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """Run a RichMap over every row: chunk → prompts → backend → parsed
    output columns appended (mapInPandas; same harness economics as
    operators/completions.py — per-executor batch = rate-limit unit)."""
    backend = backend or rich_map.mock
    missing = [c for c in rich_map.input_cols if c not in df.columns]
    if missing:
        raise ValueError(f"map {rich_map.name}: missing input columns {missing}")
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

    return df.mapInPandas(_runner, schema=schema)
