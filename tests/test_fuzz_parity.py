"""Property-based Spark↔oracle parity on adversarial text.

Hypothesis generates text over hostile alphabets (control chars, unicode,
regex metachars, whitespace runs); a deterministic seeded corpus covers the
targeted edge cases. Every generated turn must agree exactly between the
distributed pipeline and the pandas oracle on (drop_reason, scrubbed_text,
lang) — the strong form of the F1/exact-equality contract.

One Spark job per test run (batched), not per example: hypothesis drives
corpus construction, Spark runs once.
"""

from __future__ import annotations

import random
import string

import pandas as pd
from hypothesis import given, settings, strategies as st

from open_thoughts_spark.oracle import oracle_decisions
from open_thoughts_spark.pipeline import quality_filter

ALPHABETS = [
    string.ascii_letters + string.digits + " ",
    string.printable,
    " \t\n\x0b\f\r",
    "éüñçøâ一二三中文테스트русский",
    "@.+-_<>|{}[]()$%^&*!~`'\"\\",
    # mixed ASCII words + accented letters: exercises \b / word-class
    # boundaries where Java (ASCII) and default Python (Unicode) diverge
    "el la los the und ist für hélp cópe éü " + string.ascii_lowercase,
]

TARGETED = [
    "", "  ", "As an AI language model", "sk-ABCdef123456789", "a@b.co",
    "+1-555-0147", "I'm sorry,\tbut", "\x00\x01control", "Write a program\n",
    "¿qué?", "ＡＢＣ full width", "\U0001F600 emoji", "tab\tsep\tvals",
    "ends with backslash \\", "\\d+ regex literal", "<|endoftext|>",
    "http://x.y [image]", "el la los que es como por una para",
    "der die das und ist nicht", "一二三四五", None,
    # adjacent boundary-consuming PII (r3 two-pass fixpoint): both masked
    "pair 10.0.0.1 10.0.0.2 end", "call 555-123-4567 555-987-6543",
    "run 10.0.0.1 10.0.0.2 10.0.0.3 10.0.0.4 done",
    "cards 4111-1111-1111-1111 5222-2222-2222-2222 x",
    "tel.555-123-4567 and x-555-987-6543",  # leading ./- excluded: leaks, same in all engines
    # trunk-prefix NANP (ADVICE r3 fix): masks via the 1-XXX alternative;
    # mid-run anchors still rejected
    "call 1-555-123-4567 now", "1.555.123.4567", "ref 21-555-123-4567",
    "adjacent 1-555-123-4567 1-555-987-6543 end",
    # ASCII-vs-Unicode word-boundary regressions (ADVICE r1): \w/\s/\b
    # must behave identically in Spark (Java), pandas (re.ASCII) and DuckDB
    "cannot hélp with that", "unable to cópe with your plan",
    "laé elü istö fürx", "moroné and sk-ABCdef123456é",
    "drew the imageé and the érmap here", "FÜR DIE ÜBUNG",
]

ROLES = ["user", "assistant", "system", "tool"]


def _corpus(seed: int, n: int) -> list[str | None]:
    rng = random.Random(seed)
    out = list(TARGETED)
    for _ in range(n):
        pool = rng.choice(ALPHABETS)
        out.append("".join(rng.choice(pool) for _ in range(rng.randint(0, 250))))
    return out


def _assert_parity(spark, texts: list[str | None]) -> None:
    rows = [
        (f"c{i}", 0, ROLES[i % len(ROLES)], t) for i, t in enumerate(texts)
    ]
    schema = "conv_id string, turn_idx int, role string, text string"
    got = (
        quality_filter(spark.createDataFrame(rows, schema), with_turn_order=False)
        .select("conv_id", "drop_reason", "scrubbed_text", "lang")
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    want = (
        oracle_decisions(pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"]))
        .set_index("conv_id")
        .sort_index()
    )
    for c in got.index:
        g, w = got.loc[c], want.loc[c]
        wr = w["drop_reason"] if pd.notna(w["drop_reason"]) else None
        assert (g["drop_reason"] or None) == wr, (c, g["drop_reason"], wr)
        gs, ws = g["scrubbed_text"], w["scrubbed_text"]
        assert (gs is None and ws is None) or gs == ws, (c, gs, ws)
        assert g["lang"] == w["lang"], (c, g["lang"], w["lang"])


@given(seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=3, deadline=None)
def test_fuzz_parity(spark, seed):
    _assert_parity(spark, _corpus(seed, 250))


# --- sampler / skew-guard kernel parity (driver-replayable md5 kernels) ---

@st.composite
def _budget_corpus(draw):
    domains = draw(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=60))
    rows = [
        (d, i, draw(st.integers(min_value=0, max_value=500)))
        for i, d in enumerate(domains)
    ]
    budget = draw(st.integers(min_value=0, max_value=3000))
    return rows, budget


@given(_budget_corpus())
@settings(max_examples=5, deadline=None)
def test_token_budget_sampler_matches_python_replica(spark, case):
    """Every kept row must match a driver-side replay of the md5-uniform vs
    trunc(prob*2^32) kernel — including frac==1 pass-through, zero-token
    domains and budget=0."""
    import hashlib

    from open_thoughts_spark.operators.relational import sample_to_token_budget

    rows, budget = case
    df = spark.createDataFrame(rows, "domain string, id long, toks int")
    got = {
        (r["domain"], r["id"])
        for r in sample_to_token_budget(df, "domain", "toks", budget, ["id"]).collect()
    }
    totals: dict[str, int] = {}
    for d, _, t in rows:
        totals[d] = totals.get(d, 0) + t
    want = set()
    for d, i, _ in rows:
        h = int(hashlib.md5(f"tokbudget|{i}".encode()).hexdigest()[:8], 16)
        frac = min(1.0, float(budget) / max(totals[d], 1))
        if h < int(frac * float(1 << 32)):
            want.add((d, i))
    assert got == want


@st.composite
def _band_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    rows = [
        (
            i,
            draw(st.integers(min_value=0, max_value=2)),
            draw(st.sampled_from(["k1", "k2", "hot", "x"])),
        )
        for i in range(n)
    ]
    cap = draw(st.integers(min_value=0, max_value=8))
    return rows, cap


@given(_band_corpus())
@settings(max_examples=5, deadline=None)
def test_cap_band_buckets_matches_python_replica(spark, case):
    from collections import Counter

    from open_thoughts_spark.operators import dedup

    rows, cap = case
    df = spark.createDataFrame(rows, "doc_id long, band_idx int, band_key string")
    got = {
        (r["doc_id"], r["band_idx"], r["band_key"])
        for r in dedup.cap_band_buckets(df, cap).collect()
    }
    sizes = Counter((b, k) for _, b, k in rows)
    want = {(i, b, k) for i, b, k in rows if sizes[(b, k)] <= cap}
    assert got == want
    audit = {
        (r["band_idx"], r["band_key"], r["bucket_n"])
        for r in dedup.oversize_band_buckets(df, cap).collect()
    }
    assert audit == {(b, k, n) for (b, k), n in sizes.items() if n > cap}
