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


IP_CC_CASES = [
    ("server at 10.0.42.7 is down", "server at <IP> is down"),
    ("card 4111 1111 1111 1111 charged", "card <CC> charged"),
    ("card 4111-1111-1111-1111 charged", "card <CC> charged"),
    # version strings survive (only 4 dotted groups scrub)
    ("upgrade to 1.2.3 now", "upgrade to 1.2.3 now"),
    # 5-group dotted runs survive intact: '.' is excluded from the
    # consumed boundary class, so no partial masking
    ("oid 1.2.3.4.5 stays", "oid 1.2.3.4.5 stays"),
    # CJK-adjacent IPs mask identically in all three engines (consumed
    # boundary classes, not \b — RE2's ASCII \b would diverge here)
    ("地址10.0.0.7上有", "地址<IP>上有"),
    # adjacent IPs one space apart: the first pass consumes the separator,
    # the repeat pass (SCRUB_STEPS 'ip2') masks the survivor — both masked
    ("pair 10.0.0.1 10.0.0.2 end", "pair <IP> <IP> end"),
    # three adjacent: pass 1 masks #1 and #3, the repeat pass masks #2
    ("run 10.0.0.1 10.0.0.2 10.0.0.3 end", "run <IP> <IP> <IP> end"),
    # adjacent phones both mask (ADVICE r2: '555-' used to leak)
    ("call 555-123-4567 555-987-6543", "call <PHONE> <PHONE>"),
    # phone shapes still work after the reorder
    ("Call (212) 555-0147 about 192.168.0.1", "Call <PHONE> about <IP>"),
    # sentence-final IPs mask (trailing '.<non-digit>' / '.<end>' allowed)
    ("connect to 10.0.0.1.", "connect to <IP>."),
    ("see 10.0.0.1. Next point", "see <IP>. Next point"),
    # year lists survive: cards must start with [3-6]
    ("the years 1991 1992 1993 1994 saw", "the years 1991 1992 1993 1994 saw"),
    # 5-group digit runs: the trailing guard stops a groups-1-4 match, but
    # the scan then matches groups 2-5 (leading boundary is the space; no
    # lookbehind in the portable dialect) — over-masking toward safety,
    # consistent across engines
    ("ids 4234 5678 9012 3456 7890 end", "ids 4234 <CC> end"),
    # trunk-prefix NANP (ADVICE r3: '1-555-123-4567' used to escape
    # entirely after '-'/'.' left the leading boundary class — covered now
    # by an explicit 1-XXX-XXX-XXXX alternative)
    ("call 1-555-123-4567 now", "call <PHONE> now"),
    ("1-555-123-4567", "<PHONE>"),
    ("fax 1.555.123.4567 end", "fax <PHONE> end"),
    ("intl +1-555-123-4567 ok", "intl <PHONE> ok"),
    # mid-digit-run anchoring still rejected (the reason for the exclusion)
    ("ref 21-555-123-4567 code", "ref 21-555-123-4567 code"),
    ("long 1-555-123-45678 id", "long 1-555-123-45678 id"),
]


def test_scrub_ip_and_cc():
    for raw, expected in IP_CC_CASES:
        assert scrub_text(raw) == expected, raw


def test_scrub_ip_cc_spark_parity(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in IP_CC_CASES], "text string")
    got = [r[0] for r in df.select(scrub_expr("text")).collect()]
    assert got == [exp for _, exp in IP_CC_CASES]


def test_scrub_ip_cc_duckdb_parity():
    import duckdb

    con = duckdb.connect()
    con.execute("create table t(i int, s varchar)")
    con.executemany(
        "insert into t values (?, ?)",
        [(i, raw) for i, (raw, _) in enumerate(IP_CC_CASES)],
    )
    rows = con.sql(f"select i, {scrub_sql('s')} from t order by i").fetchall()
    for i, got in rows:
        assert got == IP_CC_CASES[i][1], IP_CC_CASES[i][0]
