"""Text analysis: token counting, quality scoring, fingerprinting.

Reference analogs: token-length analysis with a HF tokenizer
(/root/reference/open_thoughts_3/dcft/data_strategies/Stratos/
filter_out_less_16k.py:30-72, open_thoughts/analyze/analyze_length.py:77-83)
and the per-filter counting that drives curation decisions. Exact-tokenizer
counts need a model; the engine's native proxies (whitespace tokens and a
BPE-ish regex token count) run JVM-side at full speed, and the UDF harness in
functions/perplexity.py shows where a real tokenizer would plug in.

All expressions are regex-portable (Java/Python/RE2) so every stat is also
expressible in the DuckDB correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"

# BPE-ish pre-tokenizer: word pieces, numbers, single punctuation — the
# GPT-2-style pretokenization shape without lookarounds (portable subset).
BPE_TOKEN_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
]
STOPWORD_REGEX = "(?i)\\b(" + "|".join(STOPWORDS) + ")\\b"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (``len(text.split())`` semantics)."""
    s = F.regexp_replace(text, f"^{_WS_CLASS}+|{_WS_CLASS}+$", "")
    return F.when(s == "", F.lit(0)).otherwise(F.size(F.split(s, f"{_WS_CLASS}+")))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via regexp_count — a cheap, deterministic proxy
    for tokenizer length (≈1 token per word piece / digit / symbol)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_REGEX))


def stopword_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(STOPWORD_REGEX))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit("[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"))


def quality_score_expr(text: Column) -> Column:
    """Composite quality score in [0,1]: length sweet-spot × stopword
    presence × low punctuation density. Deterministic, portable arithmetic
    (single-expression doubles — no cross-row summation)."""
    wc = ws_token_count(text).cast("double")
    n = F.length(text).cast("double")
    len_score = F.least(wc / F.lit(20.0), F.lit(1.0)) * F.when(
        wc > 200, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    stop_ratio = F.when(wc > 0, stopword_count(text) / wc).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio * 4, F.lit(1.0))
    punct_ratio = F.when(n > 0, punct_count(text) / n).otherwise(F.lit(0.0))
    punct_score = F.greatest(F.lit(1.0) - punct_ratio * 2, F.lit(0.0))
    return F.round(len_score * (F.lit(0.5) + F.lit(0.5) * stop_score) * punct_score, 6)


def fingerprint_expr(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-normalized,
    punctuation-stripped text — the exact-dup key used by dedup pipelines.
    (Rolling/Rabin hashes shard this per-chunk at 100 TB; md5-of-normalized
    is the deterministic, engine-portable core.)"""
    norm = F.lower(F.trim(F.regexp_replace(text, f"{_WS_CLASS}+", " ")))
    norm = F.regexp_replace(norm, "[^a-z0-9 ]", "")
    return F.md5(norm)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("ws_tokens", ws_token_count(t))
        .withColumn("bpe_tokens", bpe_token_count(t))
        .withColumn("stopwords", stopword_count(t))
        .withColumn("punct_chars", punct_count(t))
        .withColumn("quality_score", quality_score_expr(t))
        .withColumn("fingerprint", fingerprint_expr(t))
    )
