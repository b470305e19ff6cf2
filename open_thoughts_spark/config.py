"""Thresholds and constants for the quality-filter engine.

Every constant is traceable to the reference (file:line under /root/reference)
or to BASELINE.json's north rule; see comments.
"""

from __future__ import annotations

# --- instruction heuristics (Alpaca/utils.py:135-161) ---
TOO_SHORT_WORDS = 3  # <= 3 words -> too_short
TOO_LONG_WORDS = 150  # > 150 words -> too_long

# --- repetition rule (constructed; reference analog: n-gram machinery
# _A1_Source/utils.py:33-52, repetition strata in FIXTURES.md) ---
REPETITION_MIN_WORDS = 10  # only judge repetition on texts with >= this many words
REPETITION_DISTINCT_RATIO = 0.30  # distinct_words/words < ratio -> drop

# --- symbol/word ratio (constructed; analog open_thoughts/code/filters.py:6-13
# which drops code descriptions with markup artifacts) ---
SYMBOL_RATIO_MAX = 0.30  # non [A-Za-z0-9 whitespace] chars / chars > ratio -> drop

# --- language ID (fasttext_operator.py:37-38 default filter_threshold=0.5) ---
LANGID_THRESHOLD = 0.5  # drop if predicted lang != 'en' with prob >= threshold
LANGID_KEEP_LANG = "en"
LANGID_MAX_CHARS = 512  # classify on this prefix (cost cap; language is
#                         evident in the first 512 chars — fastText-style)

# --- perplexity (KenLM-style bits-per-char; north_star in BASELINE.json).
# Calibrated on the fixture strata: clean English ~3.8-4.2 bpc under the
# embedded char-trigram model, PII/tool turns ~5.1-5.5, random-letter
# gibberish / base64 blobs ~6.0+. 5.7 separates the two regimes.
PERPLEXITY_MAX_BITS_PER_CHAR = 5.7
PERPLEXITY_MAX_CHARS = 512  # score at most this many chars per turn (cost cap)

# --- length cutoffs in characters (proxy for the 16k-token cutoff,
# Stratos/filter_out_less_16k.py:69-72; ~4 chars/token) ---
MAX_TURN_CHARS = 65536

# --- fuzzy dedup / decontamination (deduplicate.py:17, decontaminate.py:12,
# b2_train_fasttext_math_pos_numina_neg_all.yaml:151-152) ---
FUZZY_DEDUP_SIMILARITY = 95.0
DECONTAMINATE_FUZZY_SIMILARITY = 75.0
DECONTAMINATE_NGRAM_N = 13

# --- MinHash-LSH defaults (public LSH practice; tuned for jaccard ~0.8) ---
MINHASH_NUM_PERM = 64
MINHASH_BANDS = 16
MINHASH_ROWS_PER_BAND = 4
SHINGLE_SIZE = 3  # word shingles

# --- fastText-style scoring batch size (fasttext_operator.py:40) ---
SCORE_BATCH_SIZE = 500

# --- boilerplate list scope: False = curated refusal/AI-disclosure subset
# (the quality-filter north-rule target), True = the reference's complete
# 228-phrase WizardLM blacklist (wizardlm_clean.py:9-243; includes topical
# phrases — higher drop rate, exact reference parity) ---
BOILERPLATE_FULL_LIST = False

# --- rule names, in cascade precedence order (first hit wins; mirrors the
# reason-cascade pattern of Alpaca/utils.py:135-161) ---
RULE_ORDER = [
    "empty",
    "too_short",
    "too_long",
    "blacklisted",
    "write_a_program_prefix",
    "punctuation_prefix",
    "ascii_prefix",
    "boilerplate",
    "url_artifact",
    "endoftext_artifact",
    "non_english",  # before repetition/symbol so CJK text reads non_english, not symbol_heavy
    "repetition",
    "symbol_heavy",
    "high_perplexity",
]
