"""ROUGE-L similarity filtering against a seed pool — Alpaca parity.

Reference: each machine-generated instruction is scored with ROUGE-L
against all seed-task instructions and kept only if the max similarity is
below 0.7 (/root/reference/open_thoughts_3/dcft/data_strategies/Alpaca/
utils.py:289-309, rouge_scorer("rougeL")). ROUGE-L F1 = 2·LCS/(|a|+|b|)
over lowercase [a-z0-9]+ tokens (the rouge_score default tokenizer).

Spark shape: the seed pool is collected once and broadcast (seed pools are
small — Alpaca ships 175 seed tasks); scoring runs in an Arrow-batched
pandas UDF with a numpy-vectorized LCS inner loop (row-DP with
``maximum.accumulate`` — O(|a|) vector ops of width |b| per pair, no
per-cell Python). Cost is rows × pool — a verify-channel operator, like
levenshtein_pairs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def rouge_tokens(text: str) -> list[str]:
    """rouge_score default tokenization: lowercase, [a-z0-9]+ runs."""
    return _TOKEN_RE.findall((text or "").lower())


def lcs_length(a: np.ndarray, b: np.ndarray) -> int:
    """LCS length via vectorized row DP: tmp[j] = max(prev[j],
    prev[j-1] + eq[j]); cur = cummax(tmp) (valid because LCS rows are
    monotone non-decreasing)."""
    if len(a) == 0 or len(b) == 0:
        return 0
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    for ta in a:
        tmp = np.maximum(prev[1:], prev[:-1] + (b == ta))
        prev[1:] = np.maximum.accumulate(tmp)
    return int(prev[-1])


def rouge_l_f1(a_tokens: list[str], b_tokens: list[str]) -> float:
    if not a_tokens or not b_tokens:
        return 0.0
    # interning tokens to int ids makes the equality compare numpy-cheap
    vocab: dict[str, int] = {}
    aid = np.array([vocab.setdefault(t, len(vocab)) for t in a_tokens])
    bid = np.array([vocab.setdefault(t, len(vocab)) for t in b_tokens])
    lcs = lcs_length(aid, bid)
    return 2.0 * lcs / (len(a_tokens) + len(b_tokens))


def with_max_rouge(
    df: DataFrame,
    seed_texts: list[str],
    text_col: str = "text",
    out_col: str = "max_rouge_l",
    round6: bool = True,
) -> DataFrame:
    """Attach max ROUGE-L F1 vs the (broadcast) seed pool, rounded to 6dp
    (rank-stable float discipline). ``round6=False`` yields the raw IEEE
    double — use when the caller integer-scales the score itself (the
    value-oracle path truncs ``1e6 * raw`` so both engines compare exact
    int64s)."""
    seeds = [rouge_tokens(s) for s in seed_texts]

    @F.pandas_udf("double")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            out = []
            for t in batch:
                toks = rouge_tokens(t)
                score = max(
                    (rouge_l_f1(toks, s) for s in seeds), default=0.0
                )
                out.append(round(score, 6) if round6 else score)
            yield pd.Series(out, dtype="float64")

    return df.withColumn(out_col, _udf(F.col(text_col)))


def rouge_seed_filter(
    df: DataFrame,
    seed_texts: list[str],
    text_col: str = "text",
    max_similarity: float = 0.7,
) -> DataFrame:
    """Alpaca utils.py:289-309 parity: keep rows whose max ROUGE-L against
    every seed is STRICTLY below the threshold (reference: ``max(...) >
    0.7 → continue``)."""
    return (
        with_max_rouge(df, seed_texts, text_col)
        .filter(F.col("max_rouge_l") <= max_similarity)
        .drop("max_rouge_l")
    )
