"""Unit tests for the heuristic rules: tiny in-memory frames, exact reasons.

Mirrors the reference's rule semantics with explicit cases per family
(Alpaca/utils.py:135-161, Airoboros/utils.py:8-34, wizardlm_clean.py:9-243,
open_thoughts/code/filters.py:6-13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_thoughts_spark.pipeline import quality_filter

# (role, text, expected_reason-or-None)
CASES = [
    ("user", "Explain how a hash join works in a distributed engine.", None),
    ("user", "", "empty"),
    ("user", "   \t  ", "empty"),
    ("user", "ok then", "too_short"),
    ("assistant", "yes", "too_short"),
    ("user", "word " * 151, "too_long"),
    ("user", "Please describe the image in the attachment for me.", "blacklisted"),
    ("user", "Write a program that reverses a linked list in place.", "write_a_program_prefix"),
    ("user", "? is this a question about joins or about shuffles", "punctuation_prefix"),
    ("user", "¿como funciona esto exactamente en la version nueva?", "ascii_prefix"),
    ("assistant", "As an AI language model, I cannot do that for you.", "boilerplate"),
    ("assistant", "I'm sorry, that request is outside what I can help with today.", "boilerplate"),
    ("assistant", "My knowledge cutoff is September 2021 so this may be stale.", "boilerplate"),
    ("assistant", "See http://example.com for the details of the setup stuff.", "url_artifact"),
    ("user", "the file ended with <|endoftext|> which broke the parser", "blacklisted"),
    ("assistant", "the log ended with <|endoftext|> which broke the parser there", "endoftext_artifact"),
    ("assistant", "El informe es una guía clara para el equipo y para los clientes.", "non_english"),
    ("assistant", ("loop " * 24).strip(), "repetition"),
    # punct-prefix is user-only, so an assistant symbol soup reads symbol_heavy
    ("assistant", "=== *** !!! ### $$$ %%% ^^^ &&& ((( ))) ___ +++", "symbol_heavy"),
    ("user", "*** !!! ### starts with punctuation", "punctuation_prefix"),
    ("user", "xqzwv jkqpf zzyyx qqvvb wkxjz pqzkv mjqxw zkvpq", "high_perplexity"),
    # role gating: responses aren't subject to instruction rules & vice versa
    ("assistant", "Please describe the image in the attachment for me.", None),
    ("user", "As an AI language model, I cannot do that for you.", None),
    ("assistant", "? is this a question about joins or about shuffles", None),
    # tool turns: JSON payloads survive
    ("tool", '{"tool": "search", "hits": 3}', None),
    ("tool", "{}", None),
    # system turns behave structurally
    ("system", "You are a helpful assistant for billing questions today.", None),
]


@pytest.fixture(scope="module")
def decided(spark):
    rows = [(f"c{i}", i, role, text) for i, (role, text, _) in enumerate(CASES)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = quality_filter(df, with_turn_order=False)
    got = {
        r["turn_idx"]: r["drop_reason"]
        for r in out.select("turn_idx", "drop_reason").collect()
    }
    return got


def test_expected_reasons(decided):
    for i, (role, text, expected) in enumerate(CASES):
        assert decided[i] == expected, (
            f"case {i} ({role!r}, {text[:50]!r}): got {decided[i]!r}, "
            f"want {expected!r}"
        )


def test_null_text_is_empty(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", None)], "conv_id string, turn_idx int, role string, text string"
    )
    out = quality_filter(df, with_turn_order=False)
    assert out.select("drop_reason").collect()[0][0] == "empty"


def test_full_wizardlm_list_mode(spark):
    from open_thoughts_spark.rules import phrases
    import re

    full = phrases.load_full_wizardlm_list()
    assert len(full) == 228
    rx_full = re.compile(phrases.boilerplate_regex(full_wizardlm=True))
    rx_sub = re.compile(phrases.boilerplate_regex(full_wizardlm=False))
    # topical phrase only in the full reference list
    assert rx_full.search("that would be ableist of me to say")
    assert not rx_sub.search("that would be ableist of me to say")
    # refusal phrases in both
    for rx in (rx_full, rx_sub):
        assert rx.search("As an AI language model, no.")
    # the full alternation stays in the portable dialect (compiles in Java too)
    df = spark.createDataFrame([("as an AI I cannot",)], "text string")
    from pyspark.sql import functions as F
    assert df.filter(F.col("text").rlike(phrases.boilerplate_regex(True))).count() == 1


# --- math/proof domain filters ---

def test_math_filter_reference_parity(spark):
    """Pin the exact filter_problems / filter_out_proofs semantics
    (math/filter.py:4-18, MultipleSamples/utils.py:295-301)."""
    from open_thoughts_spark.rules.math_rules import (
        filter_math_problems,
        filter_out_proofs,
        with_math_decision,
    )

    rows = [
        (0, "Find x such that x+1=2", "so \\boxed{1}"),          # keep
        (1, "See the FIGURE for details", "\\boxed{2}"),          # figure
        (2, "a) first part b) second part", "\\boxed{3}"),        # multipart
        (3, "A) not multipart b) because A) uppercase? no", "\\boxed{4}"),  # a) ci
        (4, "fine problem", None),                                 # missing
        (5, "fine problem", ""),                                   # missing
        (6, "fine problem", "QED \\boxed{}"),                      # proof qed
        (7, "fine problem", "no box here"),                        # no boxed
        (8, "Prove that 1=1", "\\boxed{1}"),                       # proof marker
        (9, "show  that", "\\boxed{1}"),                           # 'show ' hits
        (10, "the proofreader", "\\boxed{1}"),                     # 'proof' substring hits
        (11, "the answer: is given", "\\boxed{1}"),                # answer: keyword
    ]
    df = spark.createDataFrame(rows, "id long, problem string, solution string")

    kept = sorted(r["id"] for r in filter_math_problems(df).collect())
    # reference filter_problems drops 1,2,4,5,6,7,11 and — because it
    # lowercases before startswith — the uppercase 'A)' row 3 as well
    assert kept == [0, 8, 9, 10]

    nonproof = sorted(r["id"] for r in filter_out_proofs(df).collect())
    assert 8 not in nonproof and 9 not in nonproof and 10 not in nonproof
    assert 0 in nonproof

    dec = {r["id"]: r["math_drop_reason"] for r in with_math_decision(df).collect()}
    assert dec[0] is None
    assert dec[1] == "figure_keyword"
    assert dec[2] == "multipart"
    assert dec[6] == "proof_qed"
    assert dec[7] == "no_boxed"
    assert dec[8] == "proof_problem"


def test_code_filter_reference_parity(spark):
    """Pin filter_problem/filter_tests/filter_solutions semantics
    (open_thoughts/code/filters.py:4-48)."""
    from open_thoughts_spark.rules.math_rules import with_code_decision

    long = "x" * 250
    rows = [
        (0, long, '{"inputs": ["1"], "outputs": ["2"]}', '["s"]'),   # keep
        (1, "see HTTP://a.b " + long, '{"inputs": ["1"], "outputs": ["2"]}', '["s"]'),
        (2, "[IMAGE] " + long, '{"inputs": ["1"], "outputs": ["2"]}', '["s"]'),
        (3, "short desc", '{"inputs": ["1"], "outputs": ["2"]}', '["s"]'),
        (4, long, '{"inputs": [], "outputs": ["2"]}', '["s"]'),
        (5, long, '{"inputs": ["1"], "outputs": []}', '["s"]'),
        (6, long, None, '["s"]'),
        (7, long, '{"inputs": ["1"], "outputs": ["2"]}', "[]"),
        (8, None, '{"inputs": ["1"], "outputs": ["2"]}', '["s"]'),
    ]
    df = spark.createDataFrame(
        rows, "id long, description string, tests string, solutions string"
    )
    dec = {r["id"]: r["code_drop_reason"] for r in with_code_decision(df).collect()}
    assert dec[0] is None
    assert dec[1] == "url_in_description"       # lowercased match
    assert dec[2] == "image_in_description"
    assert dec[3] == "description_too_short"
    assert dec[4] == "no_tests"
    assert dec[5] == "no_tests"
    assert dec[6] == "no_tests"                  # null tests -> drop
    assert dec[7] == "no_solutions"
    assert dec[8] == "description_too_short"     # null description -> drop


def test_gopher_rules_fire_individually(spark):
    from open_thoughts_spark.rules.gopher import with_gopher_decision

    good = ("the cat sat with a dog and that was that because we have seen "
            "many things happen here today and tomorrow brings more work ") * 3
    rows = [
        (0, good),                                                   # keep
        (1, "too few words here"),                                   # word_count
        (2, good + " " + "### " * 30),                               # symbol_ratio (hashes)
        (3, "- a\n- b\n- c\n- d\n- e"),                              # bullets (also short)
        (4, good + "...\n" + "more...\n" + "uh...\n" + "so...\n"),   # ellipsis lines
        (5, ("1234 5678 9012 3456 7890 " * 12) + "the of and to be that have"),
        (6, ("zzzz " * 60).strip()),                                 # no stop words
        (7, ("a b c " * 40) + "the of"),                             # mean len < 3
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    dec = {r["id"]: r["gopher_drop_reason"] for r in with_gopher_decision(df).collect()}
    assert dec[0] is None
    assert dec[1] == "word_count"
    assert dec[2] == "symbol_ratio"
    assert dec[3] == "word_count"  # cascade order: bullets doc is also short
    assert dec[4] == "ellipsis_lines"
    assert dec[5] == "non_alpha_words"
    assert dec[6] == "stop_words"
    assert dec[7] == "mean_word_length"


def test_repetition_stats_paragraphs_and_split_semantics(spark):
    """Code-review r2: dup_paragraph_frac had no discriminating coverage;
    also pin the '\\n\\n\\n' run split (regex vs literal must agree)."""
    import duckdb

    from open_thoughts_spark.rules.gopher import with_repetition_stats

    rows = [
        (1, "para one\n\npara one\n\npara two"),     # 1 dup of 3 paras
        (2, "a\n\n\nb"),                              # '\n\n\n' run edge
        (3, "unique one\n\nunique two\n\nunique three"),
        # DISCRIMINATING for the paragraph conjunct: duplicate multi-line
        # paragraphs whose dup_line_frac stays <= 0.3 — only the paragraph
        # arm can fail this row
        (4, "a\nb\n\na\nb\n\nc\nd\ne\nf\ng\nh\ni\nj"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (round(r["dup_paragraph_frac"], 6), r["keep_repetition"])
           for r in with_repetition_stats(df, "id").collect()}
    assert got[1] == (round(1 / 3, 6), False)   # 0.333 > 0.3 -> drop
    assert got[3] == (0.0, True)
    row4 = with_repetition_stats(df.filter("id = 4"), "id").collect()[0]
    assert round(row4["dup_line_frac"], 6) <= 0.3
    assert round(row4["dup_paragraph_frac"], 6) == round(1 / 3, 6)
    assert row4["keep_repetition"] is False    # paragraph arm alone drops it
    # cross-engine: Spark regex split('\n\n') on "a\n\n\nb" == DuckDB literal
    con = duckdb.connect()
    duck = con.execute(
        "select string_split(?, chr(10) || chr(10))", ["a\n\n\nb"]
    ).fetchone()[0]
    spark_parts = df.filter("id = 2").select(
        F.split("text", "\\n\\n")
    ).collect()[0][0]
    assert spark_parts == duck == ["a", "\nb"]
    assert got[2][0] == 0.0
