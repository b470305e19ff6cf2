"""Representative completions prompt/parse maps — engine/maps parity.

The reference ships ~60 map classes, each a (prompt builder, response
parser) pair run through the completions operator
(/root/reference/open_thoughts_3/engine/maps/map_registry.py:1-112). Four
representative shapes are reproduced here against the mock backend (the
MOCK_VERIFY test posture — open_thoughts/math/judge.py:46-49):

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


MAPS: dict[str, RichMap] = {
    m.name: m
    for m in (
        JUDGE_MAP, DIFFICULTY_MAP, EXTRACT_ANSWER_MAP, REASON_MAP,
        CHAT_MAP, BINARY_CLASSIFIER_MAP, LIST_MAP,
        CRITIC_MAP, RANKER_MAP, FUSER_MAP,
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
