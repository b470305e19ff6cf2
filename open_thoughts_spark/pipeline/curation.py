"""Domain curation chains — the OpenThoughts-114k entry points, composed.

Reference entry point 2 (/root/reference/open_thoughts/math/maths.py:10-36):
    load → filter(source) → filter(problems) → rename → add domain/source
    → fuzzy dedup → decontaminate vs eval sets → reason (LLM annotate)
    → push.
Reference entry point 3 (/root/reference/open_thoughts/mix.py:15-40):
    per-domain verify (judge → filter correct) → map to ShareGPT →
    select columns → concatenate → push verified + unverified mixes.

This module composes the engine's operators into those exact shapes. Every
step is a lazy DataFrame transform — the whole chain is ONE Catalyst plan
per output, with the fuzzy-dedup/decontamination stages running as
MinHash-LSH (the scalable equivalent of the reference's all-pairs
rapidfuzz, SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_thoughts_spark.operators import relational
from open_thoughts_spark.operators.completions import (
    CompletionMap,
    completions,
    mock_backend,
)
from open_thoughts_spark.operators.conversations import (
    instruction_response_to_long,
    long_to_sharegpt,
)
from open_thoughts_spark.operators.decontaminate import ngram_decontaminate
from open_thoughts_spark.operators.dedup import minhash_dedup
from open_thoughts_spark.operators.verify import filter_correct, with_verdict


@dataclass
class DomainConfig:
    """One domain's curation recipe (maths.py / code.py / puzzle.py shape)."""

    name: str
    id_col: str
    text_col: str
    source_col: str | None = None
    keep_sources: list[str] | None = None
    problem_filter: Callable[[DataFrame], DataFrame] | None = None
    renames: dict[str, str] = field(default_factory=dict)
    dedup_jaccard: float = 0.8
    decontaminate_ngram: int = 13
    tag_domain: bool = True  # set False when rows carry per-subject domains


def curate_domain(
    df: DataFrame,
    cfg: DomainConfig,
    eval_sets: list[DataFrame] | None = None,
    annotate: bool = True,
    backend=mock_backend,
) -> DataFrame:
    """maths.py:10-36 chain on a raw domain table."""
    out = df
    if cfg.keep_sources and cfg.source_col:
        out = relational.filter_by_values(out, cfg.source_col, include=cfg.keep_sources)
    if cfg.problem_filter:
        out = cfg.problem_filter(out)
    if cfg.renames:
        out = relational.force_rename_columns(out, cfg.renames)
    if cfg.tag_domain:
        out = out.withColumn("domain", F.lit(cfg.name))
    # fuzzy dedup (deduplicate.py:17-55 → MinHash-LSH keep-min-id)
    out = minhash_dedup(
        out, cfg.id_col, cfg.text_col, min_jaccard=cfg.dedup_jaccard
    )
    # decontaminate vs each eval set (decontaminate.py:12-59 → n-gram
    # broadcast anti-join per eval registry entry, eval.py:1-23)
    for ev in eval_sets or []:
        out = ngram_decontaminate(
            out, ev, cfg.text_col, n=cfg.decontaminate_ngram, id_col=cfg.id_col
        )
    if annotate:
        # reason step (reason.py / mocked_reasoner posture)
        cmap = CompletionMap(
            name="reason",
            build_prompt=lambda s: "Reason step by step, then answer:\n" + s,
            parse_response=lambda s: s,
        )
        out = completions(out, cmap, prompt_col=cfg.text_col, out_col="reasoning", backend=backend)
    return out


def verify_and_mix(
    domains: dict[str, DataFrame],
    answer_col: str,
    truth_col: str,
    instruction_col: str,
    response_col: str,
    id_col: str,
) -> dict[str, DataFrame]:
    """mix.py:15-40 fan-in: per-domain judge → filter correct → ShareGPT →
    union. Returns {'verified': ..., 'unverified': ...} (both ShareGPT)."""
    verified_parts, unverified_parts = [], []
    for name, df in domains.items():
        judged = with_verdict(df, answer_col, truth_col)
        for bucket, frame in (
            (verified_parts, filter_correct(judged)),
            (unverified_parts, judged),
        ):
            long = instruction_response_to_long(
                frame.select(id_col, instruction_col, response_col),
                instruction_col,
                response_col,
                id_col,
            )
            nested = long_to_sharegpt(long, id_col=id_col)
            bucket.append(nested.withColumn("domain", F.lit(name)))
    return {
        "verified": relational.concatenate(verified_parts),
        "unverified": relational.concatenate(unverified_parts),
    }


# --- named domain chains: science (camel) + puzzle (riddle_sense) ---

SCIENCE_SUBJECTS = ("biology", "chemistry", "physics")


def riddle_sense_format(
    df: DataFrame,
    question_col: str = "question",
    choices_col: str = "choices",
    answer_key_col: str = "answerKey",
) -> DataFrame:
    """puzzle.py:10-19 (riddle_sense_map), native: fold the multiple-choice
    labels/texts into the question body ("\\nA: text..."), promote answerKey
    to 'answer', drop the raw columns. ``choices`` is the HF shape
    struct<label: array<string>, text: array<string>> — one zip_with +
    aggregate, no UDF."""
    folded = F.concat(
        F.col(question_col),
        F.aggregate(
            F.zip_with(
                F.col(f"{choices_col}.label"),
                F.col(f"{choices_col}.text"),
                lambda l, t: F.concat(F.lit("\n"), l, F.lit(": "), t),
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
    )
    return (
        df.withColumn(question_col, folded)
        .withColumn("answer", F.col(answer_key_col))
        .drop(answer_key_col, choices_col)
    )


def curate_science(
    subjects: dict[str, DataFrame],
    id_col: str,
    samples_per_subtopic: int = 2,
    eval_sets: list[DataFrame] | None = None,
    annotate: bool = True,
    backend=mock_backend,
) -> DataFrame:
    """science.py:15-37 chain: per-subject CAMEL table → per-sub_topic
    seeded subsample (camel.py:55-64) → tag domain=subject → concatenate →
    rename message_1/topic; → select columns → source='camel' → shared
    dedup/decontaminate/reason tail. The per-subtopic sample is
    ``stratified_sample`` (hash-seeded, partition-independent) — the
    distributed twin of pandas .sample(random_state=42) per group."""
    parts = []
    for subject in subjects:
        if subject not in SCIENCE_SUBJECTS:
            raise ValueError(f"unknown science subject: {subject}")
    for subject, df in subjects.items():
        sub = relational.stratified_sample(
            df, "sub_topic", samples_per_subtopic, [id_col], salt="camel42"
        )
        parts.append(sub.withColumn("domain", F.lit(subject)))
    ds = relational.concatenate(parts)
    ds = relational.force_rename_columns(
        ds, {"message_1": "question", "topic;": "topic"}
    )
    ds = ds.select(id_col, "question", "domain", "topic", "sub_topic")
    ds = ds.withColumn("source", F.lit("camel"))
    cfg = DomainConfig(
        name="science", id_col=id_col, text_col="question", tag_domain=False
    )
    return curate_domain(
        ds, cfg, eval_sets=eval_sets, annotate=annotate, backend=backend
    )


def curate_puzzle(
    df: DataFrame,
    id_col: str,
    take: int = 1_250,
    eval_sets: list[DataFrame] | None = None,
    annotate: bool = True,
    backend=mock_backend,
) -> DataFrame:
    """puzzle.py:22-40 chain: riddle_sense format map → seeded
    shuffle+take(1250) (uniform_sample_fixed: hash-ordered
    TakeOrderedAndProject, the distributed .shuffle(seed=42).take) →
    domain/source tags → shared dedup/decontaminate/reason tail."""
    ds = riddle_sense_format(df)
    ds = relational.uniform_sample_fixed(ds, take, [id_col], salt="riddle42")
    ds = ds.withColumn("source", F.lit("riddle_sense"))
    cfg = DomainConfig(name="puzzle", id_col=id_col, text_col="question")
    return curate_domain(
        ds, cfg, eval_sets=eval_sets, annotate=annotate, backend=backend
    )


def curate_code(
    df: DataFrame,
    id_col: str,
    response_col: str = "response",
    tests_col: str = "tests",
    description_col: str = "description",
    solutions_col: str = "solutions",
    eval_sets: list[DataFrame] | None = None,
    judge_timeout_s: float = 4.0,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Code-domain curation end to end (open_thoughts/code/ chain):
    problem/tests/solutions heuristics (filters.py:4-48 -> rules.math_rules
    with_code_decision), fuzzy dedup + decontamination on the problem
    description (the shared domain tail), then REJECTION SAMPLING through
    the sandboxed execution judge (judge.py:766-805 code_judge -> keep
    only rows whose generated code passes every parsed test case).

    The judge runs last on purpose: it is the expensive per-row subprocess
    stage, so the cheap heuristic/dedup stages shrink its input first —
    same economics as the reference running curator filters before the
    multiprocessing judge pool."""
    from open_thoughts_spark.operators.code_judge import filter_correct_code
    from open_thoughts_spark.rules.math_rules import with_code_decision

    out = with_code_decision(
        df, description_col=description_col, tests_col=tests_col,
        solutions_col=solutions_col,
    ).filter(F.col("keep_code")).drop("code_drop_reason", "keep_code")
    out = minhash_dedup(out, id_col, description_col, min_jaccard=0.8)
    for ev in eval_sets or []:
        out = ngram_decontaminate(
            out, ev, description_col,
            eval_text_col="text" if "text" in ev.columns else None,
            n=13, id_col=id_col,
        )
    return filter_correct_code(
        out, response_col=response_col, tests_col=tests_col,
        timeout_s=judge_timeout_s, min_parallelism=min_parallelism,
    )
