"""Gopher quality heuristics — the standard web-corpus rule set.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) document
the quality filters most large web pipelines (MassiveText, RefinedWeb,
Dolma) adopt; the reference ingests DCLM/RefinedWeb data that was curated
with exactly this family, so a complete engine carries them as first-class
rules. All are pure Catalyst expressions in the portable regex dialect —
one scan, no Python — with SQL fragments from the same constants for the
value gate.

Rules (first match wins):
- word count outside [MIN_WORDS, MAX_WORDS]
- mean word length outside [3, 10]
- symbol-to-word ratio ('#' chars + '...' ellipses) > 0.1
- > 90% of lines start with a bullet
- > 30% of lines end with an ellipsis
- < 80% of words contain an alphabetic character
- fewer than 2 distinct required stop words present
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = "[ \\t\\n\\x0B\\f\\r]"
_NWS = "[^ \\t\\n\\x0B\\f\\r]"

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
MIN_STOPWORD_HITS = 2

GOPHER_RULE_ORDER = [
    "word_count", "mean_word_length", "symbol_ratio",
    "bullet_lines", "ellipsis_lines", "non_alpha_words", "stop_words",
]

# counting patterns (portable: no multiline flag — line starts are spelled
# as (^|\n); line ENDS never use `$`, because Java's `$` matches before a
# final \r/  while RE2's matches end-of-text only — instead a sentinel
# '\n' is appended to the text before counting ellipsis-terminated lines)
BULLET_LINE_REGEX = f"(^|\\n){_WS.replace(chr(92) + 'n', '')}*[-*•]"
ELLIPSIS_LINE_REGEX = "(\\.\\.\\.|…)\\n"  # count over text + '\n'
ALPHA_WORD_REGEX = f"{_NWS}*[A-Za-z]{_NWS}*"


def gopher_rule_flags(text: Column) -> dict[str, Column]:
    wc = F.regexp_count(text, F.lit(f"{_NWS}+")).cast("double")
    nws_chars = F.length(F.regexp_replace(text, f"{_WS}+", ""))
    mean_len = F.when(wc > 0, nws_chars / wc).otherwise(F.lit(0.0))
    hashes = F.length(text) - F.length(F.translate(text, "#", ""))
    ellipses = F.regexp_count(text, F.lit("\\.\\.\\.")) + F.regexp_count(
        text, F.lit("…")
    )
    n_lines = (F.regexp_count(text, F.lit("\\n")) + 1).cast("double")
    bullet_lines = F.regexp_count(text, F.lit(BULLET_LINE_REGEX))
    ellipsis_lines = F.regexp_count(
        F.concat(text, F.lit("\n")), F.lit(ELLIPSIS_LINE_REGEX)
    )
    alpha_words = F.regexp_count(text, F.lit(ALPHA_WORD_REGEX)).cast("double")
    stop_hits = None
    for w in REQUIRED_STOPWORDS:
        # explicit whitespace boundaries, not \b: Java's \b is Unicode-aware
        # while RE2's is ASCII, and zh documents can abut stopwords to CJK
        hit = F.when(
            text.rlike(f"(?i)(^|{_WS}){w}({_WS}|$)"), 1
        ).otherwise(0)
        stop_hits = hit if stop_hits is None else (stop_hits + hit)
    return {
        "word_count": (wc < MIN_WORDS) | (wc > MAX_WORDS),
        "mean_word_length": (mean_len < MIN_MEAN_WORD_LEN)
        | (mean_len > MAX_MEAN_WORD_LEN),
        "symbol_ratio": F.when(
            wc > 0, (hashes + ellipses) / wc > MAX_SYMBOL_WORD_RATIO
        ).otherwise(F.lit(False)),
        "bullet_lines": bullet_lines / n_lines > MAX_BULLET_LINE_FRAC,
        "ellipsis_lines": ellipsis_lines / n_lines > MAX_ELLIPSIS_LINE_FRAC,
        "non_alpha_words": F.when(
            wc > 0, alpha_words / wc < MIN_ALPHA_WORD_FRAC
        ).otherwise(F.lit(False)),
        "stop_words": stop_hits < MIN_STOPWORD_HITS,
    }


def with_gopher_decision(df: DataFrame, text_col: str = "text") -> DataFrame:
    flags = gopher_rule_flags(F.col(text_col))
    whens = [
        F.when(F.coalesce(flags[n], F.lit(False)), F.lit(n))
        for n in GOPHER_RULE_ORDER
    ]
    reason = F.coalesce(*whens)
    return df.withColumn("gopher_drop_reason", reason).withColumn(
        "keep_gopher", reason.isNull()
    )


# --- repetition filters (the MassiveText/Gopher repetition family) ---

MAX_DUP_LINE_FRAC = 0.3
MAX_DUP_PARAGRAPH_FRAC = 0.3  # independent knob; coincidentally equal
MAX_TOP_BIGRAM_FRAC = 0.2


def dup_line_frac_expr(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line."""
    lines = F.split(text, "\\n")
    n = F.size(lines).cast("double")
    return (n - F.size(F.array_distinct(lines))) / n


def dup_paragraph_frac_expr(text: Column) -> Column:
    """Fraction of blank-line-separated paragraphs that are duplicates."""
    paras = F.split(text, "\\n\\n")
    n = F.size(paras).cast("double")
    return (n - F.size(F.array_distinct(paras))) / n


def with_repetition_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Attach dup_line_frac (pure map) and top_bigram_frac (the fraction of
    the document's word bigrams taken by its single most frequent bigram —
    explode → (id, gram) agg → (id) agg → join back: two aggregation
    shuffles plus the join exchange) plus ``keep_repetition``. High values
    mark boilerplate/template pages (MassiveText repetition removal)."""
    from open_thoughts_spark.operators.dedup import shingles_expr

    grams = df.select(
        F.col(id_col),
        F.explode(shingles_expr(F.col(text_col), 2, distinct=False)).alias("_g"),
    )
    top = (
        grams.groupBy(id_col, "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_total"))
        .select(
            F.col(id_col),
            (F.col("_top") / F.col("_total")).alias("top_bigram_frac"),
        )
    )
    out = df.withColumn(
        "dup_line_frac", dup_line_frac_expr(F.col(text_col))
    ).withColumn("dup_paragraph_frac", dup_paragraph_frac_expr(F.col(text_col)))
    out = out.join(top, on=id_col, how="left").withColumn(
        "top_bigram_frac", F.coalesce(F.col("top_bigram_frac"), F.lit(0.0))
    )
    return out.withColumn(
        "keep_repetition",
        (F.col("dup_line_frac") <= MAX_DUP_LINE_FRAC)
        & (F.col("dup_paragraph_frac") <= MAX_DUP_PARAGRAPH_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC),
    )


def gopher_reason_sql(text_expr: str) -> str:
    """DuckDB cascade from the SAME constants/patterns."""
    t = text_expr
    nws = "[^ \\t\\n\\x0B\\f\\r]"
    ws = "[ \\t\\n\\x0B\\f\\r]"
    wc = f"len(regexp_extract_all({t}, '{nws}+'))"
    nws_chars = f"length(regexp_replace({t}, '{ws}+', '', 'g'))"
    mean_len = f"(case when {wc} > 0 then {nws_chars} / ({wc})::double else 0.0 end)"
    hashes = f"(length({t}) - length(replace({t}, '#', '')))"
    ellipses = (
        f"(len(regexp_extract_all({t}, '\\.\\.\\.'))"
        f" + len(regexp_extract_all({t}, '…')))"
    )
    n_lines = f"(len(regexp_extract_all({t}, '\\n')) + 1)::double"
    bullets = f"len(regexp_extract_all({t}, '(^|\\n)[ \\t\\x0B\\f\\r]*[-*•]'))"
    ell_lines = f"len(regexp_extract_all({t} || chr(10), '(\\.\\.\\.|…)\\n'))"
    alpha = f"len(regexp_extract_all({t}, '{nws}*[A-Za-z]{nws}*'))"
    stop = " + ".join(
        f"(case when regexp_matches({t}, '(?i)(^|{ws}){w}({ws}|$)')"
        " then 1 else 0 end)"
        for w in REQUIRED_STOPWORDS
    )
    flags = {
        "word_count": f"({wc} < {MIN_WORDS} or {wc} > {MAX_WORDS})",
        "mean_word_length": (
            f"({mean_len} < {MIN_MEAN_WORD_LEN} or {mean_len} > {MAX_MEAN_WORD_LEN})"
        ),
        "symbol_ratio": (
            f"(case when {wc} > 0 then ({hashes} + {ellipses}) / ({wc})::double"
            f" > {MAX_SYMBOL_WORD_RATIO} else false end)"
        ),
        "bullet_lines": f"({bullets} / {n_lines} > {MAX_BULLET_LINE_FRAC})",
        "ellipsis_lines": f"({ell_lines} / {n_lines} > {MAX_ELLIPSIS_LINE_FRAC})",
        "non_alpha_words": (
            f"(case when {wc} > 0 then {alpha} / ({wc})::double"
            f" < {MIN_ALPHA_WORD_FRAC} else false end)"
        ),
        "stop_words": f"(({stop}) < {MIN_STOPWORD_HITS})",
    }
    whens = " ".join(
        f"when coalesce({flags[n]}, false) then '{n}'" for n in GOPHER_RULE_ORDER
    )
    return f"(case {whens} else null end)"
