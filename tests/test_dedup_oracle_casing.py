"""Regression (ADVICE r1): the minhash/simhash/jaccard DuckDB oracles must
tokenize like ``dedup.words_expr`` (lowercase + trim + ASCII-whitespace-run
split) — not bare ``string_split(text, ' ')`` — so they agree on text that is
NOT already lowercase single-spaced."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TEXTS = [
    "The  Quick\tBrown Fox jumps OVER the lazy dog",
    "the quick brown fox JUMPS over THE LAZY dog",
    "  Leading and trailing   whitespace  \n",
    "MiXeD CaSe MiXeD CaSe MiXeD CaSe extra words here",
    "mixed case mixed case mixed case extra words here",
    "single",
    "",
]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("casing")
    pd.DataFrame(
        {
            "doc_id": range(len(TEXTS)),
            "text": TEXTS,
            "lang": ["en"] * len(TEXTS),
            "source": ["src0", "src1"] * 3 + ["src1"],
            "n_chars": [len(t) for t in TEXTS],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from '{sf_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_minhash_signatures",
        "dedup_minhash_pairs",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "decontaminate_ngram",
    ],
)
def test_tokenizing_oracles_on_cased_text(spark, duck, sf_dir, qname):
    sdf = entrymod.queries()[qname](spark, sf_dir)
    spark_rows = sorted(tuple(r) for r in sdf.collect())
    res = duck.execute(entrymod.oracle_sql()[qname])
    duck_rows = sorted(tuple(r) for r in res.fetchall())
    assert spark_rows == duck_rows, (qname, spark_rows[:3], duck_rows[:3])
    # the fixture is built so tokenization actually matters: at least one
    # query must return rows (rows 0/1 and 3/4 are case-variant duplicates)
    if qname in ("dedup_minhash_pairs", "dedup_ngram_jaccard"):
        assert len(spark_rows) > 0
