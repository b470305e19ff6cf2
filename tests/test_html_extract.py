"""Main-content HTML extraction (functions/html_extract.py) — jusText/
Arc90-style boilerplate-block removal (VERDICT r3 #8)."""

from __future__ import annotations

from open_thoughts_spark.functions.html_extract import (
    extract_main_text,
    with_main_content,
)

PAGE = """
<html><head><title>T</title><script>var tracker = 1;</script>
<style>p { color: red }</style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<header><a href="/">SiteName</a> the best site</header>
<h1>The Story of the Test</h1>
<p>This is the main paragraph of the article and it is long enough to be
considered good content by the length rule because it has plenty of words
in it and a low link density overall.</p>
<p>It was a good day for the team, and the result was that everyone
was happy with it in the end.</p>
<div class="share"><a href="x">Share</a> <a href="y">Tweet</a></div>
<aside>Related: <a href="z">another story</a></aside>
<footer>Copyright 2026 <a href="/legal">Legal</a></footer>
</body></html>
"""


def test_main_paragraphs_survive():
    out = extract_main_text(PAGE)
    assert "main paragraph of the article" in out
    assert "good day for the team" in out


def test_nav_header_footer_aside_removed():
    out = extract_main_text(PAGE)
    for boiler in ("Home", "About", "SiteName", "Share", "Tweet",
                   "Related", "another story", "Copyright", "Legal"):
        assert boiler not in out, boiler


def test_script_style_dropped_with_content():
    out = extract_main_text(PAGE)
    assert "tracker" not in out and "color" not in out


def test_heading_rescued_by_good_neighbor():
    # stopword-free heading is near-good: kept next to a good paragraph...
    good_p = (
        "<p>This is the main paragraph of the article and it is long "
        "enough to be considered good content by the length rule with a "
        "low link density overall.</p>"
    )
    with_article = "<h1>Quarterly Revenue Report</h1>" + good_p
    out = extract_main_text(with_article)
    assert "Quarterly Revenue Report" in out and "main paragraph" in out
    # ...dropped when isolated among boilerplate (jusText context rule)
    lone = "<h1>Quarterly Revenue Report</h1><div><a href='x'>click</a></div>"
    assert extract_main_text(lone) == ""
    # stopword-dense headings classify good on their own
    assert "The Story of the Test" in extract_main_text(PAGE)


def test_link_density_boilerplate():
    linky = (
        "<p>" + " ".join(f'<a href="{i}">link {i} in the list</a>' for i in range(8))
        + "</p>"
    )
    assert extract_main_text(linky) == ""


def test_entities_and_edge_inputs():
    good = (
        "<p>Tom &amp; Jerry were the best of friends in the town that was "
        "by the sea and it was a good life for them.</p>"
    )
    assert "Tom & Jerry" in extract_main_text(good)
    assert extract_main_text(None) == ""
    assert extract_main_text("") == ""
    assert extract_main_text("plain words with the and of it") != None  # noqa: E711


def test_spark_pandas_udf_path(spark):
    df = spark.createDataFrame([(1, PAGE), (2, "<p>x</p>"), (3, None)],
                               "id int, html string")
    out = {r["id"]: r["text"] for r in with_main_content(df).collect()}
    assert "main paragraph" in out[1]
    assert out[2] == ""
    assert out[3] == ""


def test_classifier_sql_parity_fuzz():
    """The html_main_content oracle replays the classifier in SQL; fuzz the
    stopword/length branches with random word soups so threshold drift
    between functions/html_extract.py and the entry-query SQL fails here,
    not in the driver gate."""
    import random

    import duckdb

    import __spark_entry__ as entrymod
    from open_thoughts_spark.functions.html_extract import extract_main_text

    rng = random.Random(42)
    vocab = ["the", "a", "of", "to", "zzz", "qqq", "data,", "row.", "scan!",
             "agg", "(value)", "'part'", "batch", "is", "it", "была",
             "<b>tag&entity</b>", "nb\u00a0sp"]
    rows = []
    for i in range(120):
        n = rng.randint(1, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", rows)
    oracle = {
        r[0]: r[1]
        for r in con.sql(entrymod.oracle_sql()["html_main_content"]).fetchall()
    }
    import re as _re

    for doc_id, text in rows:
        m3 = doc_id % 3
        ptext = (text[:40] if m3 == 0
                 else "zzz qqq www " * 5 if m3 == 2 else text)
        # same markup-inert sanitize the entry query applies in both engines
        ptext = _re.sub(r"[<>&]|[^ -~]", "", ptext)
        html = (
            '<html><body><nav><a href="/">Home</a> <a href="/x">More</a></nav>'
            f"<h1>Doc Heading {doc_id}</h1><p>{ptext}</p>"
            '<footer>Copyright <a href="/l">Legal</a></footer></body></html>'
        )
        assert extract_main_text(html) == oracle[doc_id], (doc_id, ptext)
