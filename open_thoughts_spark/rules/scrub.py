"""Text normalization + PII/toxicity scrubbing.

The north rule (BASELINE.json) requires compiled-regex PII scrubbing (emails,
phones, keys) and toxicity masking per turn, with *exact* scrubbed-text
equality against the oracle. The reference's in-repo precedent for regex
substitution scrubbing is ``clean_text`` / ``remove_text``
(/root/reference/open_thoughts_3/dcft/data_strategies/WebInstruct/utils.py:16-89):
whitespace collapse via ``re.sub(r"\\s+", " ", ...)``, non-printable strip, and
case-insensitive phrase removal.

Engine-portability contract: every pattern below is valid and IDENTICAL in
behavior across Java regex (Spark ``regexp_replace``), Python ``re`` (oracle)
and RE2 (DuckDB). In particular we use an explicit ASCII whitespace class
instead of ``\\s`` (whose Unicode behavior differs between Python and
Java/RE2), and no lookaround/backreferences.

The scrub runs as a chain of native ``regexp_replace`` calls — JVM-side,
whole-stage-codegen'd, zero Python cost — which is the scale-correct choice
for 10^12 turns. ``scrub_series`` is the same chain on pandas for the oracle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = " \\t\\n\\x0B\\f\\r"  # explicit ASCII whitespace (dialect-portable)

# Ordered scrub steps: (name, pattern, replacement). Order is semantics.
# Steps whose patterns CONSUME a boundary character (ip/cc/phone — boundaries
# are matched classes re-inserted via $N, not zero-width \b, for cross-engine
# parity) appear TWICE: a single left-to-right pass resumes scanning after
# each match, so of two adjacent occurrences separated by one boundary char
# the second has no leading boundary left and is missed. The first pass masks
# every other occurrence in a run; the repeat pass sees each survivor
# preceded by the re-inserted boundary (or the '<TAG> ' replacement) and
# masks it — two passes are a fixpoint for arbitrarily long adjacent runs.
SCRUB_STEPS: list[tuple[str, str, str]] = [
    # 1. strip non-printable control chars (WebInstruct/utils.py:16-21 analog)
    ("controls", "[\\x00-\\x08\\x0E-\\x1F\\x7F]", ""),
    # 2. collapse runs of whitespace to a single space
    ("whitespace", f"[{_WS}]+", " "),
    # 3. emails
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    # 3b. IPv4 addresses — BEFORE phones (digit-dot runs must not be eaten
    # by a phone shape). Boundaries are CONSUMED character classes
    # re-inserted via $1/$4, not \b: Java/Python \b is Unicode-word-based
    # while RE2's is ASCII, so \b next to CJK digits diverges. Excluding
    # '.' from the boundary also makes 5-group dotted runs survive intact.
    # trailing boundary admits a sentence-final dot (". "/".<end>") but not
    # ".<digit>", so 'connect to 10.0.0.1.' masks while 5-group dotted
    # runs (OIDs, versions) survive untouched — all without lookaround
    (
        "ip",
        "(^|[^0-9.])([0-9]{1,3}(\\.[0-9]{1,3}){3})(\\.[^0-9]|\\.$|[^0-9.]|$)",
        "$1<IP>$4",
    ),
    # 3b-repeat: catch adjacent IPs whose leading boundary the first pass
    # consumed (see header comment)
    (
        "ip2",
        "(^|[^0-9.])([0-9]{1,3}(\\.[0-9]{1,3}){3})(\\.[^0-9]|\\.$|[^0-9.]|$)",
        "$1<IP>$4",
    ),
    # 3c. credit-card-shaped 4x4 digit groups — BEFORE phones (the bare
    # 3-4 phone shape would otherwise eat the middle of a card number).
    # First digit restricted to [3-6] (Amex/Visa/MC/Discover ranges) so
    # year lists ('1991 1992 1993 1994') survive; the trailing boundary
    # rejects a separator+digit so 5-group digit runs stay intact
    (
        "cc",
        "(^|[^0-9])([3-6][0-9]{3}([- ][0-9]{4}){3})([- ][^0-9]|[- ]$|[^0-9 -]|$)",
        "$1<CC>$4",
    ),
    # 3c-repeat: adjacent-occurrence fixpoint pass
    (
        "cc2",
        "(^|[^0-9])([3-6][0-9]{3}([- ][0-9]{4}){3})([- ][^0-9]|[- ]$|[^0-9 -]|$)",
        "$1<CC>$4",
    ),
    # 4. phone numbers — explicit shapes only (international +CC with 2-4
    # digit groups, NANP trunk-prefix 1-3-3-4, NANP 3-3-4, or bare 3-4) so
    # dates / number lists survive.
    # consumed digit boundaries (re-inserted via $1/$3) stop the shapes
    # from matching INSIDE longer digit runs — '1991 1992' is not a bare
    # 3-4 phone (code-review r2); inner groups are non-capturing so the
    # backref numbering stays fixed. The leading class excludes '.'/'-' so
    # the NANP shape can't anchor mid-way through a longer dashed/dotted
    # digit run; the explicit 1-XXX-XXX-XXXX alternative recovers the
    # trunk-prefix form that exclusion would otherwise leave in cleartext
    # (ADVICE r3: 'call 1-555-123-4567' must mask)
    (
        "phone",
        "(^|[^0-9.\\-])("
        "(?:\\+[0-9]{1,3}(?:[-. ][0-9]{2,4}){2,4})"
        "|(?:1[-. ](?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4})"
        "|(?:(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4})"
        "|(?:(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{4})"
        ")([^0-9]|$)",
        "$1<PHONE>$3",
    ),
    # 4-repeat: adjacent-occurrence fixpoint pass
    (
        "phone2",
        "(^|[^0-9.\\-])("
        "(?:\\+[0-9]{1,3}(?:[-. ][0-9]{2,4}){2,4})"
        "|(?:1[-. ](?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4})"
        "|(?:(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4})"
        "|(?:(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{4})"
        ")([^0-9]|$)",
        "$1<PHONE>$3",
    ),
    # 5. API-key-shaped tokens (sk-..., api_key=..., etc.)
    (
        "key",
        "\\b(sk|pk|rk|api|key|token|secret)[-_][A-Za-z0-9]{8,}\\b",
        "<KEY>",
    ),
    # 6. toxicity masking (deterministic word list; word-boundary, ci)
    (
        "toxic",
        "(?i)\\b(damn|hell|idiot|stupid|moron|jackass)\\b",
        "<TOX>",
    ),
    # 7. trim leading/trailing spaces (regex form so all engines agree)
    ("trim", "^ +| +$", ""),
]

# default flags: Java's \b is Unicode-aware like Python's default (JDK
# quirk — see rules/phrases.py), so the compiled patterns match Spark
# exactly. Replacement strings are stored in Spark's $N syntax; Python and
# DuckDB use \N — translated here (group semantics are identical).
def _py_repl(repl: str) -> str:
    return re.sub(r"\$(\d)", r"\\\1", repl)


_COMPILED = [(re.compile(p), _py_repl(r)) for _, p, r in SCRUB_STEPS]


def scrub_expr(col: Column | str) -> Column:
    """Native Spark column expression applying the full scrub chain.

    Deliberately a LINEAR chain of ``regexp_replace`` calls: an earlier
    guarded variant (``when(rlike(guard), replace).otherwise(c)``) referenced
    the previous step's expression three times, growing a ~3^n-node tree that
    codegen'd ~10x slower than the plain chain (VERDICT r2). The unguarded
    replace's scan cost ≈ the guard's rlike scan, so guards can't win."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, repl in SCRUB_STEPS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def scrub_series(s: pd.Series) -> pd.Series:
    """Pandas implementation of the identical chain (oracle / pandas-UDF path)."""
    out = s.fillna("")
    for pattern, repl in _COMPILED:
        out = out.str.replace(pattern, repl, regex=True)
    return out


def scrub_text(text: str | None) -> str:
    """Single-string scrub (oracle convenience)."""
    if text is None:
        return ""
    for pattern, repl in _COMPILED:
        text = pattern.sub(repl, text)
    return text


def scrub_sql(col_name: str) -> str:
    """DuckDB SQL expression applying the same chain (for oracle_sql
    parity). DuckDB RE2 replacement backrefs use \\N like Python's re."""
    expr = col_name
    for _, pattern, repl in SCRUB_STEPS:
        p = pattern.replace("'", "''")
        r = _py_repl(repl).replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def with_scrubbed_text(df, text_col: str = "text", out_col: str = "scrubbed_text"):
    """Attach the scrubbed text column (native, codegen'd)."""
    return df.withColumn(out_col, scrub_expr(text_col))
