"""Verification / judge operators.

Reference semantics:
- judge annotates ``correct`` then ``dataset.filter(lambda x: x["correct"])``
  (/root/reference/open_thoughts/verify.py:8-19, math/judge.py:14-49);
- MOCK_VERIFY swaps the LLM judge for a constant-true mock in tests
  (math/judge.py:46-49);
- majority voting over multiple sampled answers per question
  (open_thoughts_3/dcft/data_strategies/MultipleSamples/utils.py:166-207);
- k-shortest/longest answer selection (_D2_IA_Filtering/utils.py:4-42).

The LLM call itself is an external service; here the judge is a pluggable
batch callable run through the pandas-UDF harness, with the deterministic
mock as default (exactly the reference's test posture). Everything after the
judge — filtering, vote counting, selection — is native Spark.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mock_judge(answers: pd.Series, truths: pd.Series) -> pd.Series:
    """MOCK_VERIFY analog: deterministic normalized-equality judge."""
    norm = lambda s: s.fillna("").str.strip().str.lower()  # noqa: E731
    return norm(answers) == norm(truths)


def with_verdict(
    df: DataFrame,
    answer_col: str,
    truth_col: str,
    judge: Callable[[pd.Series, pd.Series], pd.Series] = mock_judge,
    out_col: str = "correct",
) -> DataFrame:
    """Annotate correctness with a batched judge (swap ``judge`` for a real
    LLM/math-verify/code-exec callable — same harness)."""

    @F.pandas_udf("boolean")
    def _udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for answers, truths in it:
            yield judge(answers, truths)

    return df.withColumn(out_col, _udf(F.col(answer_col), F.col(truth_col)))


def filter_correct(df: DataFrame, correct_col: str = "correct") -> DataFrame:
    """verify.py:8-19 — keep judged-correct rows."""
    return df.filter(F.col(correct_col))


def majority_vote(
    df: DataFrame,
    question_col: str,
    answer_col: str,
    normalize: bool = True,
) -> DataFrame:
    """MultipleSamples/utils.py:166-207 — per question, the most frequent
    answer wins (count groupBy + deterministic argmax: count desc, answer asc).
    Returns (question, majority_answer, votes, total)."""
    ans = F.col(answer_col)
    if normalize:
        ans = F.lower(F.trim(ans))
    counted = (
        df.select(F.col(question_col).alias("_q"), ans.alias("_a"))
        .groupBy("_q", "_a")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("_q").orderBy(F.desc("votes"), F.asc("_a"))
    totals = counted.groupBy("_q").agg(F.sum("votes").alias("total"))
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(totals, on="_q")
        .select(
            F.col("_q").alias(question_col),
            F.col("_a").alias("majority_answer"),
            "votes",
            "total",
        )
    )


def k_shortest(
    df: DataFrame, group_col: str, text_col: str, k: int, longest: bool = False
) -> DataFrame:
    """_D2_IA_Filtering/utils.py:4-42 — keep the k shortest (or longest)
    responses per group, ties broken deterministically by text."""
    length = F.length(F.col(text_col))
    order = [F.desc(length) if longest else F.asc(length), F.asc(text_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
