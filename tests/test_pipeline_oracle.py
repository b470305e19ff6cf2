"""The correctness gate: Spark pipeline vs single-process pandas oracle.

FIXTURES.md golden-oracle contract: per-turn keep/drop F1 >= 0.99 (target 1.0
on the fixture), exact scrubbed-text equality, and drop-reason metric counts
equal to the oracle's groupby counts.
"""

from __future__ import annotations

import pandas as pd
import pytest

from open_thoughts_spark.oracle import oracle_decisions
from open_thoughts_spark.pipeline import quality_filter, drop_reason_metrics

KEY = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def spark_result(spark, transcripts_path) -> pd.DataFrame:
    df = spark.read.parquet(transcripts_path)
    out = quality_filter(df, langid_mode="native")
    cols = KEY + [
        "role",
        "lang",
        "lang_prob",
        "bits_per_char",
        "drop_reason",
        "keep",
        "scrubbed_text",
    ]
    return out.select(*cols).toPandas().sort_values(KEY).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_result(transcripts_pdf) -> pd.DataFrame:
    return oracle_decisions(transcripts_pdf).sort_values(KEY).reset_index(drop=True)


def test_fixture_covers_all_rules(oracle_result):
    reasons = set(oracle_result["drop_reason"].dropna().unique())
    expected = {
        "empty",
        "too_short",
        "too_long",
        "boilerplate",
        "url_artifact",
        "non_english",
        "repetition",
        "symbol_heavy",
        "high_perplexity",
    }
    missing = expected - reasons
    assert not missing, f"fixture never triggers: {missing}"
    # and a healthy majority is kept
    assert oracle_result["keep"].mean() > 0.4


def test_keep_drop_f1(spark_result, oracle_result):
    assert len(spark_result) == len(oracle_result)
    assert (spark_result["conv_id"] == oracle_result["conv_id"]).all()
    s = spark_result["keep"].to_numpy()
    o = oracle_result["keep"].to_numpy()
    tp = (s & o).sum()
    fp = (s & ~o).sum()
    fn = (~s & o).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} < 0.99"
    # on the deterministic fixture we expect exact agreement
    assert f1 == 1.0, f"expected exact agreement, got F1={f1:.6f}"


def test_drop_reasons_match(spark_result, oracle_result):
    s = spark_result["drop_reason"].fillna("kept")
    o = oracle_result["drop_reason"].fillna("kept")
    mismatch = (s != o)
    assert mismatch.sum() == 0, (
        f"{mismatch.sum()} reason mismatches, e.g.\n"
        f"{pd.DataFrame({'spark': s[mismatch], 'oracle': o[mismatch]}).head(10)}"
    )


def test_scrubbed_text_exact(spark_result, oracle_result):
    s = spark_result["scrubbed_text"]
    o = oracle_result["scrubbed_text"]
    neq = (s != o)
    assert neq.sum() == 0, (
        f"{neq.sum()} scrub mismatches, e.g. spark={s[neq].iloc[0]!r} "
        f"oracle={o[neq].iloc[0]!r}"
    )


def test_langid_and_ppl_match(spark_result, oracle_result):
    assert (spark_result["lang"] == oracle_result["lang"]).all()
    assert (
        (spark_result["lang_prob"] - oracle_result["lang_prob"]).abs() < 1e-12
    ).all()
    assert (
        (spark_result["bits_per_char"] - oracle_result["bits_per_char"]).abs() < 1e-9
    ).all()


def test_udf_langid_mode_agrees(spark, transcripts_path, spark_result):
    df = spark.read.parquet(transcripts_path)
    out = (
        quality_filter(df, langid_mode="udf", with_turn_order=False)
        .select("conv_id", "turn_idx", "lang", "lang_prob", "keep")
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    assert (out["lang"] == spark_result["lang"]).all()
    assert (out["keep"] == spark_result["keep"]).all()


def test_metrics_match_oracle_counts(spark, transcripts_path, oracle_result):
    df = spark.read.parquet(transcripts_path)
    m = drop_reason_metrics(quality_filter(df)).toPandas()
    spark_counts = dict(zip(m["reason"], m["rows"]))
    oracle_counts = (
        oracle_result["drop_reason"].fillna("kept").value_counts().to_dict()
    )
    assert spark_counts == oracle_counts


def test_turn_rank_is_stable_ordering(spark, transcripts_path):
    df = spark.read.parquet(transcripts_path)
    out = quality_filter(df, with_turn_order=True).select(
        "conv_id", "turn_idx", "turn_rank"
    )
    bad = out.filter((out.turn_rank - 1) != out.turn_idx).count()
    assert bad == 0  # turn_idx is dense from 0 → rank-1 == idx despite shuffled layout


def test_rule_hit_matrix_invariants(spark, transcripts_path):
    """Ablation matrix consistency: attributed <= hits per rule, attributed
    totals equal the cascade's drop counts exactly, and shadowed is their
    gap. The first rule in RULE_ORDER can never be shadowed."""
    from open_thoughts_spark.pipeline.metrics import (
        drop_reason_metrics,
        rule_hit_matrix,
    )
    from open_thoughts_spark import config

    df = spark.read.parquet(transcripts_path)
    out = quality_filter(df, with_turn_order=False)
    matrix = {r["rule"]: r for r in rule_hit_matrix(out).collect()}
    reasons = {
        r["reason"]: r["rows"] for r in drop_reason_metrics(out).collect()
    }
    assert set(matrix)  # non-empty rule inventory
    for rule, row in matrix.items():
        assert 0 <= row["attributed"] <= row["hits"]
        assert row["shadowed"] == row["hits"] - row["attributed"]
        assert row["attributed"] == reasons.get(rule, 0)
    first = next(r for r in config.RULE_ORDER if r in matrix)
    assert matrix[first]["shadowed"] == 0
    # overlap really exists in the fixture (otherwise the matrix adds
    # nothing over the metrics table and the test proves too little)
    assert any(r["shadowed"] > 0 for r in matrix.values())
