"""Unit tests for the PII/toxicity scrub chain — exact expected outputs."""

from __future__ import annotations

import pandas as pd
import pytest

from open_thoughts_spark.rules.scrub import (
    scrub_expr,
    scrub_series,
    scrub_sql,
    scrub_text,
)

CASES = [
    # (raw, expected)
    ("Contact jane.doe@example.com now", "Contact <EMAIL> now"),
    ("Call +1-555-0147 today", "Call <PHONE> today"),
    ("Call (212) 555-0147 today", "Call <PHONE> today"),
    ("token sk-abc123XYZ789 is live", "token <KEY> is live"),
    ("api_key=x api_abcdefgh1234 done", "api_key=x <KEY> done"),
    ("what the hell is this", "what the <TOX> is this"),
    ("Hello   world\t\tagain", "Hello world again"),
    ("  padded  ", "padded"),
    ("ctrl\x01\x02chars", "ctrlchars"),
    ("mixed: a@b.co and +44 20 7946 0958 ok", "mixed: <EMAIL> and <PHONE> ok"),
    ("", ""),
    ("no pii here at all", "no pii here at all"),
    # idempotence-ish: already-scrubbed stays put
    ("<EMAIL> <PHONE> <KEY>", "<EMAIL> <PHONE> <KEY>"),
    # order: whitespace collapse happens before email matching
    ("a@b.com\t\tx", "<EMAIL> x"),
]


def test_scrub_text_cases():
    for raw, expected in CASES:
        assert scrub_text(raw) == expected, raw


def test_scrub_series_matches_scalar():
    s = pd.Series([raw for raw, _ in CASES])
    out = scrub_series(s)
    assert list(out) == [exp for _, exp in CASES]


def test_scrub_expr_matches_python(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "text string")
    got = [r[0] for r in df.select(scrub_expr("text")).collect()]
    assert got == [exp for _, exp in CASES]


def test_scrub_sql_matches_python():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for raw, expected in CASES:
        got = con.execute(
            f"select {scrub_sql('t')} from (select ? as t)", [raw]
        ).fetchone()[0]
        assert got == expected, raw


def test_scrub_null_safe(spark):
    df = spark.createDataFrame([(None,)], "text string")
    assert df.select(scrub_expr("text")).collect()[0][0] is None
    assert scrub_text(None) == ""
