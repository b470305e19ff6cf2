"""Property-based Python↔DuckDB parity for the portable kernels.

The value gate only sees fixture text; these fuzz the exact contracts the
oracles rely on — mini-BPE counts, ASCII tokenization, md5 bucketing —
over hostile alphabets (unicode, whitespace runs, digits, empty)."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from open_thoughts_spark.functions.bpe import bpe_count_sql, bpe_token_count
from open_thoughts_spark.functions.portable_hash import (
    TOKENS_SQL,
    ascii_tokens,
    bucket_sql,
    md5_bucket,
)

ALPHABETS = [
    string.ascii_letters + string.digits + " ",
    " \t\n\x0b\f\r_-",
    "théü一二三 and the ïng ed es",
    string.printable,
]


def _corpus(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    out = ["", " ", "the and ing", "a" * 300]
    for _ in range(n):
        pool = rng.choice(ALPHABETS)
        out.append("".join(rng.choice(pool) for _ in range(rng.randint(0, 120))))
    return out


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_bpe_count_parity_fuzz(seed):
    texts = _corpus(seed, 120)
    con = duckdb.connect()
    con.execute("create table t(i int, s varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(texts)))
    rows = con.sql(f"select i, {bpe_count_sql('s')} from t order by i").fetchall()
    for i, got in rows:
        assert got == bpe_token_count(texts[i]), repr(texts[i])


@pytest.mark.parametrize("seed", [3, 11])
def test_tokens_and_bucket_parity_fuzz(seed):
    texts = _corpus(seed, 80)
    con = duckdb.connect()
    con.execute("create table t(i int, s varchar)")
    con.executemany("insert into t values (?, ?)", list(enumerate(texts)))
    tok_expr = TOKENS_SQL.format(text="s")
    rows = con.sql(
        f"""select i, list(tok order by ord), list({bucket_sql('tok', 64)} order by ord)
            from (select i, unnest({tok_expr}) as tok,
                         generate_subscripts({tok_expr}, 1) as ord from t)
            where tok != '' group by i order by i"""
    ).fetchall()
    got = {i: (toks, buckets) for i, toks, buckets in rows}
    for i, text in enumerate(texts):
        py_toks = ascii_tokens(text)
        if not py_toks:
            assert i not in got, repr(text)
            continue
        assert got[i][0] == py_toks, repr(text)
        assert got[i][1] == [md5_bucket(t, 64) for t in py_toks], repr(text)
