"""Language identification — fastText-lid-style (label, prob) per turn.

The reference scores text with fastText ``model.predict`` in batches of 500
and thresholds the probability of a target label
(/root/reference/open_thoughts_3/engine/operators/fasttext_operator.py:100-158).
fastText isn't available in this environment, so the engine ships a hermetic,
fully deterministic marker-based classifier with the same *operator shape*:

- per language, a regex of high-frequency function words (CJK: a literal
  character-range class) — public linguistic knowledge, no downloads;
- score = count of marker hits per language; prediction = argmax with a fixed
  tie-break order; prob = top count / total count (0 hits → ``('und', 0.0)``).

Three interchangeable implementations, all computing the identical result:

1. ``with_langid`` — native Spark ``regexp_count`` expressions (JVM,
   whole-stage codegen; the 10^12-turn path: no Python at all).
2. ``langid_udf`` — vectorized pandas UDF using ``Series.str.count`` (the
   fastText-operator harness shape: batch in, batch out; swap the body for a
   real model when one is available).
3. ``langid_pandas`` — the same pandas code for the single-process oracle.

Because (1) is regex-portable (Java/Python/RE2 common dialect), the same
classification is expressible in DuckDB SQL for the correctness oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, DoubleType

# Fixed language order — also the argmax tie-break priority.
LANGS: list[str] = ["en", "es", "de", "fr", "zh"]

# Marker word lists per language (pairwise DISJOINT — the single-pass
# combined-scan optimization in langid_exprs depends on it; see test).
LANG_WORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "you", "for", "with", "was"],
    "es": ["el", "la", "los", "las", "que", "es", "como", "por", "una", "para", "esta", "pero"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auch", "sind"],
    "fr": ["le", "les", "et", "est", "pour", "vous", "dans", "une", "qui", "avec", "mais", "sont"],
}

def _portable_word(w: str) -> str:
    """Non-ASCII letters as explicit [xX] classes: Java's (?i) folds ASCII
    only while RE2 folds Unicode, so spelling both cases out makes all three
    engines agree on e.g. 'für' vs 'FÜR'."""
    out = []
    for c in w:
        if ord(c) > 127 and c.lower() != c.upper():
            out.append(f"[{c.lower()}{c.upper()}]")
        else:
            out.append(c)
    return "".join(out)


# Marker regexes (case-insensitive where alphabetic). Literal CJK range for zh
# keeps the pattern valid in Java regex, Python re, and RE2 alike. \b is
# Unicode-aware in BOTH Java (JDK quirk) and default Python — they agree;
# RE2's ASCII \b agrees on ASCII text (see rules/phrases.py).
MARKERS: dict[str, str] = {
    **{
        lang: "(?i)\\b(" + "|".join(_portable_word(w) for w in words) + ")\\b"
        for lang, words in LANG_WORDS.items()
    },
    "zh": "[一-鿿]",
}

_RESULT_SCHEMA = StructType(
    [StructField("lang", StringType()), StructField("lang_prob", DoubleType())]
)


def langid_exprs(text: Column) -> tuple[Column, Column]:
    """(lang, prob) as pure native expressions. Null text → ('und', 0.0),
    matching the oracle's fillna("") behavior. Classification runs on the
    first LANGID_MAX_CHARS (cost cap on pathological rows; mirrored in the
    pandas oracle and the SQL fragments).

    Formulation note: one regexp_count per language is the measured optimum.
    The tempting single-scan alternative (regexp_extract_all + per-language
    array filters) is ~4x SLOWER: higher-order array functions are
    interpreted (no codegen) and the hit arrays allocate per row.
    """
    from open_thoughts_spark import config

    text = F.substring(F.coalesce(text, F.lit("")), 1, config.LANGID_MAX_CHARS)
    counts = [F.regexp_count(text, F.lit(MARKERS[lang])) for lang in LANGS]
    total = sum(counts[1:], counts[0])
    # argmax with earliest-language tie-break: max over struct(count, -idx, lang)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    c.alias("n"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang")
                )
                for i, (lang, c) in enumerate(zip(LANGS, counts))
            ]
        )
    )
    lang = F.when(total == 0, F.lit("und")).otherwise(best["lang"])
    prob = F.when(total == 0, F.lit(0.0)).otherwise(
        best["n"].cast("double") / total.cast("double")
    )
    return lang, prob


def with_langid(
    df: DataFrame, text_col: str = "text", out_lang: str = "lang", out_prob: str = "lang_prob"
) -> DataFrame:
    lang, prob = langid_exprs(F.col(text_col))
    return df.withColumn(out_lang, lang).withColumn(out_prob, prob)


def langid_pandas(texts: pd.Series) -> pd.DataFrame:
    """Vectorized pandas implementation (oracle + UDF body). Identical result."""
    from open_thoughts_spark import config

    s = texts.fillna("").str.slice(0, config.LANGID_MAX_CHARS)
    counts = pd.DataFrame({lang: s.str.count(MARKERS[lang]) for lang in LANGS})
    total = counts.sum(axis=1)
    # idxmax returns the first max in column order == tie-break priority
    lang = counts.idxmax(axis=1)
    top = counts.max(axis=1)
    prob = (top / total.where(total > 0, 1)).astype("float64")
    lang = lang.where(total > 0, "und")
    prob = prob.where(total > 0, 0.0)
    return pd.DataFrame({"lang": lang, "lang_prob": prob})


def langid_udf():
    """Scalar-iterator pandas UDF returning struct<lang,lang_prob>.

    The fastText-operator harness shape (batched predict, model loaded once
    per executor — fasttext_operator.py:193-240); body is the marker scorer.
    """

    @F.pandas_udf(_RESULT_SCHEMA)
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield langid_pandas(batch)

    return _udf


def with_langid_udf(df: DataFrame, text_col: str = "text") -> DataFrame:
    """UDF-based variant (same results as with_langid; used to exercise the
    pandas-UDF model-scoring harness end-to-end)."""
    res = langid_udf()(F.col(text_col))
    return (
        df.withColumn("_lid", res)
        .withColumn("lang", F.col("_lid.lang"))
        .withColumn("lang_prob", F.col("_lid.lang_prob"))
        .drop("_lid")
    )


def langid_sql(text_expr: str) -> dict[str, str]:
    """DuckDB SQL fragments: marker-count expressions per language."""
    from open_thoughts_spark import config

    capped = f"substr({text_expr}, 1, {config.LANGID_MAX_CHARS})"
    return {
        lang: f"len(regexp_extract_all({capped}, '{MARKERS[lang]}'))"
        for lang in LANGS
    }
