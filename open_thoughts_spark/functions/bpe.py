"""Deterministic mini-BPE tokenizer — the exact-tokenizer token-count rule.

The reference's 16k/32k token-length cutoffs run a real tokenizer over each
row (/root/reference/open_thoughts_3/dcft/data_strategies/Stratos/
filter_out_less_16k.py:30-72: AutoTokenizer count, keep rows above the
cutoff). No tokenizer model ships in this container, so this module carries
a merge-table-driven byte-pair tokenizer that is (a) a real subword
tokenizer shape — normalization, symbolization, ranked pair merges — and
(b) exactly replayable in DuckDB SQL, so the count is value-checked by the
correctness gate rather than proxied by a regex.

Tokenization spec (every step has the same semantics in Python str ops and
DuckDB string functions — leftmost non-overlapping global replace):

1. norm  = trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))
2. norm2 = replace(norm, ' ', '_')            (word boundary symbol)
3. seq   = chars of norm2 joined by single spaces
4. for (x, y) in MERGES (rank order): seq = replace(seq, 'x y', 'xy')
   — one pass per merge rule, global leftmost non-overlapping: the
   single-pass variant of BPE encoding (classic BPE re-scans for earlier
   rules after each merge; one ranked pass keeps the construction
   deterministic AND expressible as a finite replace chain in SQL).
5. tokens = split(seq, ' ');  count = spaces + 1 (0 for empty seq)

Swapping in a real tokenizer = replacing ``bpe_tokens`` inside the same
pandas-UDF harness (see ``bpe_token_count_udf``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ranked merge table (highest priority first): frequent English pairs, then
# second-order merges building on earlier outputs. Data, not code — the
# shape of a learned BPE merges.txt.
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("e", "s"), ("o", "u"), ("i", "t"), ("i", "s"),
    ("a", "l"), ("in", "g"), ("e", "d"), ("c", "o"), ("s", "t"),
    ("the", "_"), ("and", "_"), ("es", "_"), ("ed", "_"),
]

_NORM_RE = re.compile("[^a-z0-9]+")


def bpe_tokens(text: str) -> list[str]:
    """Token list for one string (pure Python — the oracle/UDF kernel)."""
    norm = _NORM_RE.sub(" ", (text or "").lower()).strip().replace(" ", "_")
    if not norm:
        return []
    seq = " ".join(norm)
    for x, y in MERGES:
        seq = seq.replace(f"{x} {y}", x + y)
    return seq.split(" ")


def bpe_token_count(text: str) -> int:
    return len(bpe_tokens(text))


def bpe_count_sql(text_expr: str) -> str:
    """DuckDB expression computing the identical count (for oracle_sql)."""
    # coalesce: NULL text must count 0 like the Python kernel's `or ""`,
    # not propagate NULL through the replace chain
    norm = (
        f"replace(trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        " '[^a-z0-9]+', ' ', 'g')), ' ', '_')"
    )
    seq = f"rtrim(regexp_replace({norm}, '(.)', '\\1 ', 'g'))"
    for x, y in MERGES:
        seq = f"replace({seq}, '{x} {y}', '{x}{y}')"
    return (
        f"(case when {seq} = '' then 0"
        f" else length({seq}) - length(replace({seq}, ' ', '')) + 1 end)"
    )


def bpe_token_count_udf():
    """Scalar-iterator pandas UDF — the exact-tokenizer harness (batched,
    kernel swappable for a real AutoTokenizer)."""

    @F.pandas_udf("long")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            yield batch.map(bpe_token_count).astype("int64")

    return _udf


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "bpe_count"
) -> DataFrame:
    return df.withColumn(out_col, bpe_token_count_udf()(F.col(text_col)))


def filter_min_tokens(
    df: DataFrame, min_tokens: int, text_col: str = "text"
) -> DataFrame:
    """filter_out_less_16k.py:69-72 — keep rows with >= min_tokens exact
    tokens (the 16k cutoff rule, cutoff scaled to the data at hand)."""
    return with_bpe_token_count(df, text_col).filter(
        F.col("bpe_count") >= min_tokens
    ).drop("bpe_count")
