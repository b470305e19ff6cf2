"""DuckDB SQL fragment generators sharing the engine's rule constants.

The driver's correctness gate runs each Spark query side-by-side with an ANSI
SQL oracle in DuckDB. These helpers emit SQL built from the SAME regex/
threshold constants as the Spark expressions (rules/phrases.py, config.py,
rules/scrub.py), in the Java/Python/RE2-portable dialect subset, so the two
engines agree value-for-value.
"""

from __future__ import annotations

from open_thoughts_spark import config
from open_thoughts_spark.functions.langid import LANGS, MARKERS
from open_thoughts_spark.rules import phrases

WS = " \\t\\n\\x0B\\f\\r"  # regex escapes, literal backslashes in SQL strings


def q(pattern: str) -> str:
    """Quote a regex for embedding in a single-quoted SQL literal."""
    return "'" + pattern.replace("'", "''") + "'"


def stripped_sql(t: str) -> str:
    return f"regexp_replace({t}, '^[{WS}]+|[{WS}]+$', '', 'g')"


def word_count_sql(t: str) -> str:
    return f"len(regexp_extract_all({t}, '[^{WS}]+'))"


def distinct_ratio_sql(t: str) -> str:
    wc = word_count_sql(t)
    return (
        f"(case when {wc} = 0 then 1.0 else "
        f"len(list_distinct(regexp_extract_all({t}, '[^{WS}]+')))::double / {wc} end)"
    )


def symbol_ratio_sql(t: str) -> str:
    return (
        f"(case when length({t}) = 0 then 0.0 else "
        f"(length({t}) - length(regexp_replace({t}, '[^A-Za-z0-9{WS}]', '', 'g')))::double"
        f" / length({t}) end)"
    )


def langid_counts_sql(t: str) -> dict[str, str]:
    capped = f"substr({t}, 1, {config.LANGID_MAX_CHARS})"
    return {
        lang: f"len(regexp_extract_all({capped}, {q(MARKERS[lang])}))" for lang in LANGS
    }


def langid_pred_sql(t: str) -> tuple[str, str]:
    """(pred_lang_expr, prob_expr) replicating argmax w/ priority tiebreak."""
    c = langid_counts_sql(t)
    total = " + ".join(c.values())
    # earliest language in LANGS wins ties → chain of >= comparisons in order
    branches = []
    for i, lang in enumerate(LANGS):
        conds = [f"{c[lang]} >= {c[other]}" for other in LANGS[i + 1 :]]
        cond = " and ".join(conds) if conds else "true"
        branches.append(f"when {cond} then '{lang}'")
    pred = f"(case when ({total}) = 0 then 'und' {' '.join(branches)} end)"
    top = f"greatest({', '.join(c.values())})"
    prob = f"(case when ({total}) = 0 then 0.0 else {top}::double / ({total}) end)"
    return pred, prob


def rule_flags_sql(t: str, with_langid: bool = True) -> dict[str, str]:
    """Boolean SQL expr per rule (no role gating, no perplexity)."""
    s = stripped_sql(t)
    wc = word_count_sql(t)
    flags = {
        "empty": f"({t} is null or {s} = '')",
        "too_short": f"({wc} <= {config.TOO_SHORT_WORDS})",
        "too_long": f"({wc} > {config.TOO_LONG_WORDS})",
        "blacklisted": f"regexp_matches({t}, {q(phrases.media_blacklist_regex())})",
        "write_a_program_prefix": f"starts_with({s}, 'Write a program')",
        "punctuation_prefix": f"regexp_matches({s}, {q(phrases.PUNCT_PREFIX_REGEX)})",
        "ascii_prefix": f"regexp_matches({s}, {q(phrases.NON_ASCII_PREFIX_REGEX)})",
        "boilerplate": f"regexp_matches({t}, {q(phrases.boilerplate_regex())})",
        "url_artifact": f"regexp_matches({t}, {q(phrases.URL_ARTIFACT_REGEX)})",
        "endoftext_artifact": f"contains({t}, '<|endoftext|>')",
        "repetition": (
            f"({wc} >= {config.REPETITION_MIN_WORDS} and "
            f"{distinct_ratio_sql(t)} < {config.REPETITION_DISTINCT_RATIO})"
        ),
        "symbol_heavy": f"({symbol_ratio_sql(t)} > {config.SYMBOL_RATIO_MAX})",
    }
    if with_langid:
        pred, prob = langid_pred_sql(t)
        flags["non_english"] = (
            f"({pred} != '{config.LANGID_KEEP_LANG}' and {pred} != 'und' "
            f"and {prob} >= {config.LANGID_THRESHOLD})"
        )
    return flags


def reason_cascade_sql(
    t: str,
    rules: list[str] | None = None,
    role_expr: str | None = None,
    role_gates: dict[str, set[str] | None] | None = None,
) -> str:
    """drop_reason CASE cascade in config.RULE_ORDER (null = keep)."""
    flags = rule_flags_sql(t)
    order = [r for r in (rules or config.RULE_ORDER) if r in flags]
    whens = []
    for name in order:
        cond = f"coalesce({flags[name]}, false)"
        if role_expr is not None and role_gates and role_gates.get(name) is not None:
            roles = ", ".join(f"'{r}'" for r in sorted(role_gates[name]))
            cond = f"({cond} and {role_expr} in ({roles}))"
        whens.append(f"when {cond} then '{name}'")
    return f"(case {' '.join(whens)} else null end)"
