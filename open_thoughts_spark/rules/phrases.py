"""Boilerplate / refusal phrase data and regex builders.

Reproduces the semantics of the reference's two response-scrubbing filter
families (data curated from, with citations):

- Airoboros banned-response regexes + banned prefixes
  (/root/reference/open_thoughts_3/dcft/data_strategies/Airoboros/utils.py:8-34).
  NOTE: the reference calls ``pattern.search(text, re.I)``, which passes
  ``re.I`` (=2) as the *start position*, so its matching is accidentally
  case-sensitive from offset 2. We implement the evident intent —
  case-insensitive search over the whole string — and our oracle defines
  the same semantics, so parity is exact within this engine.

- WizardLM "unwanted words" substring blacklist (matched on lowercased text)
  (/root/reference/open_thoughts_3/dcft/data_strategies/OpenHermes/
  data_curation/wizardlm_clean.py:9-243). We carry the refusal/AI-disclosure
  subset that the quality-filter north rule targets; the full 230-phrase list
  includes topical phrases out of scope for transcript curation.

All regexes are kept inside the common dialect of Java ``java.util.regex``
(Spark ``rlike``/``regexp_replace``), Python ``re`` (the pandas oracle) and
RE2 (DuckDB correctness oracle): no backreferences, no lookaround.
"""

from __future__ import annotations

import re

# Explicit ASCII word/whitespace classes: Java regex \w/\s are ASCII-only
# while Python's are Unicode, so shared pattern strings must spell the class
# out (RE2's \s additionally omits \x0B). \b is the one exception we keep:
# Java's \b is Unicode-aware (a documented JDK quirk — \w is ASCII, \b is
# not; verified empirically: 'moroné' has NO boundary after the n), which
# matches Python's default Unicode \b exactly, so Python-side compilations
# use default flags. DuckDB RE2's \b is ASCII — equal on ASCII text (all
# driver fixtures); accented-adjacent words are a documented RE2 edge.
_WORD = "[A-Za-z0-9_]"
_WS = "[ \\t\\n\\x0B\\f\\r]"

# Airoboros/utils.py:8-27 — regex patterns searched anywhere in the response.
AIROBOROS_REGEXES: list[str] = [
    "my programming",
    "openai",
    "language model",
    "large language",
    "as an? (ai|generative language|gpt|bot)",
    "illegal and dangerous",
    "i do(n't| not) (possess|have|exhibit) (personal|consciousness|subjective)",
    "personal (feelings|thoughts|emotions|desires|experiences|goals|objective|belief)",
    f"(can('t| ?not)|w(on't|will not)|unable.?) ({_WORD}+{_WS})+"
    f"(with (that|your)|your {_WORD}+|provide)",
    "my limitations",
    "the limitations of my",
    "my abilities",
    "violates my",
    "i (can('t| ?not)|w(on't|will not)|am (not |un)able.?).{0,30}(you are|you're|your )",
    "please note that",
]

# Airoboros/utils.py:29-34 — drop if the response *starts with* one of these.
AIROBOROS_PREFIXES: list[str] = [
    "I'm sorry,",
    "Apologies,",
    "I can't",
    "I won't",
]

# wizardlm_clean.py:9-243 (refusal/AI-disclosure subset) — case-insensitive
# substring containment.
WIZARDLM_PHRASES: list[str] = [
    "text-based AI language model",
    "as an AI",
    "as a language model",
    "an AI language",
    "AI assistant",
    "AI language model",
    "as an AI language model",
    "As an AI assistant",
    "I cannot fulfill your request",
    "I cannot fulfill that request",
    "I'm sorry, but",
    "my knowledge cutoff",
    "my knowledge cut off",
    "September 2021",
    "as an artificial intelligence",
    "I am an AI",
    "cannot provide",
    "it is not appropriate",
    "it's not appropriate",
    "I cannot engage",
    "I cannot generate",
    "I'm not able to provide",
    "I cannot create",
    "I cannot assist",
    "I'm an AI",
    "I am programmed",
    "not within my programming",
    "como modelo de lenguaje AI",
    "Como modelo de lenguaje",
    "como um modelo de linguagem",
    "responsible AI",
    "AI principles",
    "please refrain",
]


def _escape_literal(s: str) -> str:
    """Escape a literal phrase for the common Java/Python/RE2 regex subset."""
    return re.sub(r"([.^$*+?()\[\]{}|\\])", r"\\\1", s)


def load_full_wizardlm_list() -> list[str]:
    """The complete 228-phrase blacklist (wizardlm_clean.py:9-243), shipped
    as a data file so exact reference parity is available."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "unwanted_phrases.txt")
    with open(path, encoding="utf-8") as f:
        return [ln.rstrip("\n") for ln in f if ln.strip() and not ln.startswith("#")]


def boilerplate_regex(full_wizardlm: bool | None = None) -> str:
    """One case-insensitive alternation covering all three families.

    Anchored prefixes get ``^``; everything else is a bare search. Usable
    verbatim in Spark ``rlike``, Python ``re.search`` and DuckDB
    ``regexp_matches``. ``full_wizardlm`` switches between the curated
    refusal/AI-disclosure subset (default) and the complete 228-phrase
    reference list (config.BOILERPLATE_FULL_LIST governs the default).
    """
    from open_thoughts_spark import config

    if full_wizardlm is None:
        full_wizardlm = config.BOILERPLATE_FULL_LIST
    phrases = load_full_wizardlm_list() if full_wizardlm else WIZARDLM_PHRASES
    parts: list[str] = []
    parts.extend(AIROBOROS_REGEXES)
    parts.extend("^" + _escape_literal(p) for p in AIROBOROS_PREFIXES)
    parts.extend(_escape_literal(p) for p in phrases)
    return "(?i)(" + "|".join(parts) + ")"


# Alpaca/utils.py:113-133 — media-keyword blacklist for instructions,
# matched as whole words (find_word_in_string).
MEDIA_BLACKLIST: list[str] = [
    "image", "images", "graph", "graphs", "picture", "pictures",
    "file", "files", "map", "maps", "draw", "plot", "go to",
    "video", "audio", "music", "flowchart", "diagram",
]


def media_blacklist_regex() -> str:
    parts = [_escape_literal(w).replace(" ", f"{_WS}+") for w in MEDIA_BLACKLIST]
    return "(?i)\\b(" + "|".join(parts) + ")\\b"


# First-char classes for the Alpaca prefix rules (utils.py:152-158).
# string.punctuation spelled out as an explicit class (dialect-portable).
PUNCT_PREFIX_REGEX = "^[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"
NON_ASCII_PREFIX_REGEX = "^[^\\x00-\\x7F]"

# open_thoughts/code/filters.py:6-13 — markup/url artifacts.
URL_ARTIFACT_REGEX = "(http://|https://|\\[image\\])"
# WebInstructAblation/utils.py:73 — tokenizer artifact.
ENDOFTEXT_ARTIFACT = "<|endoftext|>"

COMPILED_BOILERPLATE = re.compile(boilerplate_regex())
COMPILED_MEDIA_BLACKLIST = re.compile(media_blacklist_regex())
COMPILED_PUNCT_PREFIX = re.compile(PUNCT_PREFIX_REGEX)
COMPILED_NON_ASCII_PREFIX = re.compile(NON_ASCII_PREFIX_REGEX)
COMPILED_URL_ARTIFACT = re.compile(URL_ARTIFACT_REGEX)
