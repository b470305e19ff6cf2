"""Text transforms: phrase removal, reasoning-trace markup, HTML stripping.

Reference semantics:
- ``remove_text``: case-insensitive removal of exact phrases via
  ``re.sub(re.escape(phrase), "", text, flags=IGNORECASE)``
  (/root/reference/open_thoughts_3/dcft/data_strategies/WebInstruct/
  utils.py:69-89);
- reasoning-trace wrap/unwrap: ``<|begin_of_thought|>…<|end_of_thought|>`` /
  ``<think>…</think>`` markup added or extracted with regex
  (dcft/data_strategies/commons.py:481-515);
- HTML→text: the reference uses resiliparse (utils.py:32-50); the native
  stand-in strips tags/entities with regex — adequate for markup removal,
  not a full DOM extractor (documented limitation).

All native ``regexp_replace``/``regexp_extract`` — codegen'd, portable.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _escape_literal(s: str) -> str:
    return re.sub(r"([.^$*+?()\[\]{}|\\])", r"\\\1", s)


def remove_phrases(df: DataFrame, text_col: str, phrases: list[str]) -> DataFrame:
    """WebInstruct utils.py:69-89 — strip each phrase (ci), then re-collapse
    whitespace like the reference's clean step."""
    c = F.col(text_col)
    pattern = "(?i)(" + "|".join(_escape_literal(p) for p in phrases) + ")"
    c = F.regexp_replace(c, pattern, "")
    c = F.regexp_replace(c, "[ \\t\\n\\x0B\\f\\r]+", " ")
    c = F.regexp_replace(c, "^ +| +$", "")
    return df.withColumn(text_col, c)


THOUGHT_BEGIN = "<|begin_of_thought|>"
THOUGHT_END = "<|end_of_thought|>"
SOLUTION_BEGIN = "<|begin_of_solution|>"
SOLUTION_END = "<|end_of_solution|>"


def reasoning_to_final(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """commons.py:481-497 analog: strip the thought block, keep the solution
    (fall back to full text when unmarked)."""
    out = out_col or text_col
    c = F.col(text_col)
    sol = F.regexp_extract(
        c,
        _escape_literal(SOLUTION_BEGIN) + "([\\s\\S]*?)" + _escape_literal(SOLUTION_END),
        1,
    )
    stripped = F.regexp_replace(
        c,
        _escape_literal(THOUGHT_BEGIN) + "[\\s\\S]*?" + _escape_literal(THOUGHT_END),
        "",
    )
    picked = F.when(sol != "", sol).otherwise(stripped)
    picked = F.regexp_replace(picked, "^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$", "")
    return df.withColumn(out, picked)


def final_to_reasoning(
    df: DataFrame,
    thought_col: str,
    solution_col: str,
    out_col: str = "text",
) -> DataFrame:
    """commons.py:499-515 analog: wrap (thought, solution) into the marked
    single-text format."""
    return df.withColumn(
        out_col,
        F.concat(
            F.lit(THOUGHT_BEGIN + "\n"),
            F.col(thought_col),
            F.lit("\n" + THOUGHT_END + "\n\n" + SOLUTION_BEGIN + "\n"),
            F.col(solution_col),
            F.lit("\n" + SOLUTION_END),
        ),
    )


def strip_html(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Native tag/entity stripper (resiliparse stand-in; WebInstruct
    utils.py:32-50). Scripts/styles dropped with their content."""
    out = out_col or text_col
    c = F.col(text_col)
    c = F.regexp_replace(c, "(?i)<(script|style)[\\s\\S]*?</(script|style)>", " ")
    c = F.regexp_replace(c, "<[^>]+>", " ")
    for ent, rep in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, "[ \\t\\n\\x0B\\f\\r]+", " ")
    c = F.regexp_replace(c, "^ +| +$", "")
    return df.withColumn(out, c)
