"""Single-process pandas oracle: the golden reference for the Spark pipeline.

Implements the IDENTICAL rule semantics as open_thoughts_spark.rules /
functions — same compiled regexes, same thresholds, same role gating, same
cascade precedence — in plain pandas, following the reference's test style of
a tiny deterministic dataset plus exact expected outputs (SURVEY.md §5).
Tests assert per-turn keep/drop F1 (target 1.0) and exact scrubbed-text
equality between this oracle and the distributed pipeline.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from open_thoughts_spark import config
from open_thoughts_spark.functions.langid import langid_pandas
from open_thoughts_spark.functions.perplexity import bits_per_char_batch
from open_thoughts_spark.rules import phrases
from open_thoughts_spark.rules.heuristics import RULE_ROLES
from open_thoughts_spark.rules.scrub import scrub_series

_WS = " \t\n\x0b\f\r"
_STRIP_RE = re.compile(f"^[{_WS}]+|[{_WS}]+$")
_SPLIT_RE = re.compile(f"[{_WS}]+")
_SYMBOL_RE = re.compile(f"[^A-Za-z0-9{_WS}]")


def _words(text: str) -> list[str]:
    s = _STRIP_RE.sub("", text)
    return _SPLIT_RE.split(s) if s else []


def oracle_decisions(df: pd.DataFrame) -> pd.DataFrame:
    """Compute (keep, drop_reason, scrubbed_text, lang, lang_prob,
    bits_per_char) for a transcripts pandas DataFrame."""
    out = df.copy()
    text = out["text"].fillna("")
    role = out["role"]

    lid = langid_pandas(text)
    out["lang"] = lid["lang"].to_numpy()
    out["lang_prob"] = lid["lang_prob"].to_numpy()
    out["bits_per_char"] = bits_per_char_batch(text).to_numpy()

    n = len(out)
    flags: dict[str, np.ndarray] = {}
    stripped = text.map(lambda t: _STRIP_RE.sub("", t))
    wc = text.map(lambda t: len(_words(t)))
    is_null = out["text"].isna().to_numpy()

    flags["empty"] = is_null | (stripped == "").to_numpy()
    flags["too_short"] = (wc <= config.TOO_SHORT_WORDS).to_numpy()
    flags["too_long"] = (wc > config.TOO_LONG_WORDS).to_numpy()
    flags["blacklisted"] = (
        text.map(lambda t: bool(phrases.COMPILED_MEDIA_BLACKLIST.search(t)))
    ).to_numpy()
    flags["write_a_program_prefix"] = stripped.str.startswith("Write a program").to_numpy()
    flags["punctuation_prefix"] = stripped.map(
        lambda t: bool(phrases.COMPILED_PUNCT_PREFIX.search(t))
    ).to_numpy()
    flags["ascii_prefix"] = stripped.map(
        lambda t: bool(phrases.COMPILED_NON_ASCII_PREFIX.search(t))
    ).to_numpy()
    flags["boilerplate"] = text.map(
        lambda t: bool(phrases.COMPILED_BOILERPLATE.search(t))
    ).to_numpy()
    flags["url_artifact"] = text.map(
        lambda t: bool(phrases.COMPILED_URL_ARTIFACT.search(t))
    ).to_numpy()
    flags["endoftext_artifact"] = text.str.contains(
        re.escape(phrases.ENDOFTEXT_ARTIFACT), regex=True
    ).to_numpy()

    def _distinct_ratio(t: str) -> float:
        w = _words(t)
        return (len(set(w)) / len(w)) if w else 1.0

    def _symbol_ratio(t: str) -> float:
        return (len(_SYMBOL_RE.findall(t)) / len(t)) if t else 0.0

    flags["repetition"] = (
        (wc >= config.REPETITION_MIN_WORDS).to_numpy()
        & (text.map(_distinct_ratio) < config.REPETITION_DISTINCT_RATIO).to_numpy()
    )
    flags["symbol_heavy"] = (
        text.map(_symbol_ratio) > config.SYMBOL_RATIO_MAX
    ).to_numpy()
    flags["non_english"] = (
        (out["lang"] != config.LANGID_KEEP_LANG)
        & (out["lang"] != "und")
        & (out["lang_prob"] >= config.LANGID_THRESHOLD)
    ).to_numpy()
    flags["high_perplexity"] = (
        out["bits_per_char"] > config.PERPLEXITY_MAX_BITS_PER_CHAR
    ).to_numpy()

    reason = np.full(n, None, dtype=object)
    for name in config.RULE_ORDER:
        flag = flags[name]
        roles = RULE_ROLES.get(name)
        if roles is not None:
            flag = flag & role.isin(sorted(roles)).to_numpy()
        reason = np.where((reason == None) & flag, name, reason)  # noqa: E711

    out["drop_reason"] = reason
    out["keep"] = pd.isna(out["drop_reason"])
    # null text scrubs to null (matching regexp_replace's null propagation in
    # Spark and DuckDB); non-null text scrubs through the chain
    scrubbed = scrub_series(text).to_numpy(dtype=object)
    scrubbed[is_null] = None
    out["scrubbed_text"] = scrubbed
    return out
