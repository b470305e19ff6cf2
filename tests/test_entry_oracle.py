"""Replicates the driver's correctness gate locally: run every
``__spark_entry__.queries()`` entry AND its ``oracle_sql()`` on the same
parquet tables, compare row count, column names, and order-insensitive
values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, columns):
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        # Strict like the driver's value hash: int and float are DIFFERENT
        # (DuckDB sum() returns HUGEINT/decimal — oracle SQL must cast back).
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("i", v)
        return (type(v).__name__, str(v))

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        assert len(spark_rows) >= 0  # weaker rows-only check, like the driver
        return

    res = duck.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_embedding_neardup_non_vacuous(spark):
    """VERDICT r1: the near-dup query returned 0 rows, making the cosine
    arithmetic vacuously green — pin that the threshold yields pairs."""
    df = entrymod.queries()["embedding_neardup_pairs"](spark, SF_DIR)
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert "keep" in df.columns and "scrubbed_text" in df.columns
