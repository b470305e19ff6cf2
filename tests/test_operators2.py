"""Tests: function-op harness, verification/judge ops, text transforms,
skew utilities, stateful streaming."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_thoughts_spark.operators import verify
from open_thoughts_spark.operators.function_op import (
    apply_sharded,
    apply_unsharded,
    apply_with_side_inputs,
)
from open_thoughts_spark.pipeline.skew import (
    conv_length_stats,
    salted_repartition,
    two_phase_agg,
)
from open_thoughts_spark.rules.transforms import (
    final_to_reasoning,
    reasoning_to_final,
    remove_phrases,
    strip_html,
)


# --- function op ---

def test_apply_sharded(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)

    def double_v(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": pdf["id"], "v4": pdf["v"] * 2})

    out = apply_sharded(df, double_v, "id long, v4 long")
    assert out.agg(F.max("v4")).collect()[0][0] == 99 * 4


def test_apply_unsharded_global_and_guard(spark):
    df = spark.range(50).withColumn("v", (50 - F.col("id")).cast("double"))

    def global_rank(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["rank"] = out["v"].rank(method="first").astype("int64")
        return out

    out = apply_unsharded(df, global_rank)
    top = out.filter(F.col("rank") == 50).collect()[0]
    assert top["id"] == 0
    with pytest.raises(ValueError, match="rewrite as"):
        apply_unsharded(spark.range(100), lambda p: p, max_rows=10)


def test_apply_with_side_inputs(spark):
    main = spark.range(10).withColumn("k", (F.col("id") % 2).cast("string"))
    side = spark.createDataFrame([("0", "even"), ("1", "odd")], "k string, label string")

    def enrich(pdf: pd.DataFrame, labels: pd.DataFrame) -> pd.DataFrame:
        m = dict(zip(labels["k"], labels["label"]))
        return pd.DataFrame({"id": pdf["id"], "label": pdf["k"].map(m)})

    out = apply_with_side_inputs(main, {"labels": side}, enrich, "id long, label string")
    got = {r["id"]: r["label"] for r in out.collect()}
    assert got[0] == "even" and got[1] == "odd"


# --- verification / judges ---

def test_judge_filter_and_majority_vote(spark):
    rows = [
        ("q1", " 42 ", "42"),
        ("q1", "41", "42"),
        ("q1", "42", "42"),
        ("q2", "yes", "no"),
        ("q2", "no", "no"),
    ]
    df = spark.createDataFrame(rows, "q string, answer string, truth string")
    judged = verify.with_verdict(df, "answer", "truth")
    kept = verify.filter_correct(judged)
    assert kept.count() == 3  # normalized equality: ' 42 ', '42', 'no'

    mv = verify.majority_vote(df, "q", "answer")
    got = {r["q"]: (r["majority_answer"], r["votes"], r["total"]) for r in mv.collect()}
    assert got["q1"] == ("42", 2, 3)
    assert got["q2"][2] == 2


def test_k_shortest(spark):
    rows = [("g", "aaaa"), ("g", "aa"), ("g", "a"), ("h", "bbb")]
    df = spark.createDataFrame(rows, "g string, text string")
    out = verify.k_shortest(df, "g", "text", 2)
    got = sorted((r["g"], r["text"]) for r in out.collect())
    assert got == [("g", "a"), ("g", "aa"), ("h", "bbb")]


# --- text transforms ---

def test_remove_phrases(spark):
    df = spark.createDataFrame(
        [("Sure! As an AI language model, here is the answer.",)], "text string"
    )
    out = remove_phrases(df, "text", ["as an AI language model,"]).collect()[0][0]
    assert out == "Sure! here is the answer."


def test_reasoning_trace_roundtrip(spark):
    df = spark.createDataFrame([("think hard", "x = 2")], "thought string, sol string")
    wrapped = final_to_reasoning(df, "thought", "sol")
    text = wrapped.collect()[0]["text"]
    assert "<|begin_of_thought|>" in text and "x = 2" in text
    back = reasoning_to_final(wrapped, "text", "final").collect()[0]["final"]
    assert back == "x = 2"


def test_strip_html(spark):
    df = spark.createDataFrame(
        [("<html><script>var x=1;</script><p>Hello &amp; <b>world</b></p></html>",)],
        "text string",
    )
    assert strip_html(df, "text").collect()[0][0] == "Hello & world"


# --- skew ---

def test_salted_repartition_spreads_hot_key(spark):
    hot = spark.range(2000).select(F.lit("hot").alias("k"), F.col("id"))
    cold = spark.range(100).select(F.concat(F.lit("c"), F.col("id")).alias("k"), F.col("id"))
    df = hot.unionByName(cold)
    out = salted_repartition(df, "k", salt_buckets=8, num_partitions=8)
    per_part = (
        out.withColumn("p", F.spark_partition_id())
        .filter(F.col("k") == "hot")
        .groupBy("p")
        .count()
    )
    assert per_part.count() >= 4  # hot key fanned over several partitions


def test_two_phase_agg_matches_plain(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("k"), F.col("id").alias("x")
    )
    out = two_phase_agg(df, "k", {"n": ("1", "sum"), "mx": ("x", "max")})
    plain = df.groupBy("k").agg(F.count("*").alias("n"), F.max("x").alias("mx"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_conv_length_stats(spark, transcripts_path):
    stats = conv_length_stats(spark.read.parquet(transcripts_path)).collect()[0]
    assert stats["max_rows"] > 100  # hot conversations exist
    assert stats["p50"] <= 40  # typical conversations bounded
    assert stats["max_rows"] <= 1000  # the bounded-conversation invariant


# --- stateful streaming ---

def test_conversation_state_stream(spark, transcripts_path, tmp_path):
    from open_thoughts_spark.pipeline import quality_filter
    from open_thoughts_spark.streaming import read_transcripts_stream
    from open_thoughts_spark.streaming.stateful import conversation_state_stream

    # restrict to ~100 conversations: applyInPandasWithState pays a pandas
    # roundtrip per group per micro-batch — plenty to validate semantics
    stream = read_transcripts_stream(spark, transcripts_path, max_files_per_trigger=64).filter(
        F.col("conv_id") < "conv-00000100"
    )
    decided = quality_filter(stream, with_turn_order=False)
    summaries = conversation_state_stream(decided, idle_timeout_ms=None)
    out_dir = str(tmp_path / "state_out")
    q = (
        summaries.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select * from conv_state"
    ).groupBy("conv_id").agg(F.max("turns_seen").alias("turns_seen"))
    batch = (
        spark.read.parquet(transcripts_path)
        .filter(F.col("conv_id") < "conv-00000100")
        .groupBy("conv_id")
        .count()
    )
    j = got.join(batch, on="conv_id")
    assert j.filter(F.col("turns_seen") != F.col("count")).count() == 0


# --- mini-BPE exact tokenizer ---

def test_bpe_python_duckdb_parity():
    import duckdb

    from open_thoughts_spark.functions.bpe import bpe_count_sql, bpe_token_count

    tests = [
        "", "  ", None, "The THE the and AND", "ththththe", "a a a",
        "ïéCJK一二三 and", "xxxxx", "the quick brown fox",
        "thand ing_ st th e", "thth the theand", "ed es ing the and",
        "punctuation, splits! words?  and\ttabs\nnewlines",
    ]
    con = duckdb.connect()
    con.execute("create table t(s varchar)")
    con.executemany("insert into t values (?)", [(x,) for x in tests])
    rows = con.sql(f"select s, {bpe_count_sql('s')} from t").fetchall()
    for s, d in rows:
        # SQL lower(NULL) propagates NULL -> CASE sees NULL != '' is NULL ->
        # count NULL; python kernel treats None as ''
        if s is None:
            continue
        assert bpe_token_count(s) == d, s


def test_bpe_merge_order_and_filter(spark):
    from open_thoughts_spark.functions.bpe import (
        bpe_tokens,
        filter_min_tokens,
        with_bpe_token_count,
    )

    # 'the' assembles via (t,h) then (th,e); the first occurrence then
    # absorbs its boundary via (the,_) — ranked single-pass semantics
    assert bpe_tokens("the the") == ["the_", "the"]
    assert bpe_tokens("") == []

    df = spark.createDataFrame(
        [(1, "the and is"), (2, "word " * 200)], "id int, text string"
    )
    counted = {r["id"]: r["bpe_count"] for r in with_bpe_token_count(df).collect()}
    assert counted[2] > counted[1]
    kept = filter_min_tokens(df, min_tokens=counted[1] + 1)
    assert [r["id"] for r in kept.collect()] == [2]


# --- ROUGE-L seed-pool filter ---

def _lcs_bruteforce(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


def test_lcs_vectorized_matches_bruteforce():
    import random

    import numpy as np

    from open_thoughts_spark.operators.rouge import lcs_length

    rng = random.Random(13)
    for _ in range(60):
        a = [rng.randrange(6) for _ in range(rng.randrange(12))]
        b = [rng.randrange(6) for _ in range(rng.randrange(12))]
        assert lcs_length(np.array(a), np.array(b)) == _lcs_bruteforce(a, b), (a, b)


def test_rouge_l_known_values():
    from open_thoughts_spark.operators.rouge import rouge_l_f1, rouge_tokens

    a = rouge_tokens("Write a story about a dog")
    assert rouge_l_f1(a, a) == 1.0
    assert rouge_l_f1(a, rouge_tokens("completely different words here")) == 0.0
    # lcs('a b c d', 'a x c') = 2 (a, c); f1 = 2*2/(4+3)
    got = rouge_l_f1(rouge_tokens("a b c d"), rouge_tokens("a x c"))
    assert abs(got - 4 / 7) < 1e-12
    assert rouge_l_f1([], a) == 0.0


def test_rouge_seed_filter_drops_near_copies(spark):
    from open_thoughts_spark.operators.rouge import rouge_seed_filter, with_max_rouge

    seeds = ["write a poem about the sea", "list three facts about rome"]
    rows = [
        (1, "write a poem about the sea today"),   # near-copy of seed 1
        (2, "explain how tides work in detail"),   # novel
        (3, "list three facts about rome"),        # exact copy of seed 2
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    scored = {r["id"]: r["max_rouge_l"] for r in with_max_rouge(df, seeds).collect()}
    assert scored[3] == 1.0 and scored[1] > 0.7 and scored[2] < 0.3
    kept = sorted(r["id"] for r in rouge_seed_filter(df, seeds, max_similarity=0.7).collect())
    assert kept == [2]


def test_combined_contaminated_ids_own_eval_schema(spark):
    """Eval sets carry their own id/text column names (ADVICE r2: the old
    signature silently bound the pool's id column as the eval id)."""
    from open_thoughts_spark.operators.decontaminate import (
        combined_contaminated_ids,
    )

    pool = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated text about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog again and again")],
        "qid long, question string",
    )
    hit = combined_contaminated_ids(
        pool, evals, "doc_id", "text",
        eval_id_col="qid", eval_text_col="question", n=5,
    )
    assert [r["doc_id"] for r in hit.collect()] == [1]


def test_benchmark_registry_contamination(spark):
    """Registry normalizes per-benchmark column names and reports per-
    benchmark hit counts; unknown names fall back to a 'text' column."""
    from open_thoughts_spark.operators.decontaminate import (
        EVAL_BENCHMARKS,
        benchmark_contamination_report,
        eval_texts,
    )

    pool = spark.createDataFrame(
        [
            (1, "what is the integral of x squared over the unit interval"),
            (2, "spark shuffle partitions and adaptive query execution notes"),
            (3, "what is the capital city of france in western europe today"),
        ],
        "doc_id long, text string",
    )
    frames = {
        # registered benchmark with its own column name
        "HuggingFaceH4/MATH-500": spark.createDataFrame(
            [("what is the integral of x squared over the unit interval",)],
            "problem string",
        ),
        # unregistered benchmark → 'text' fallback
        "my/quiz": spark.createDataFrame(
            [("what is the capital city of france in western europe today",)],
            "text string",
        ),
    }
    rep = {
        r["benchmark"]: r["contaminated_count"]
        for r in benchmark_contamination_report(
            pool, frames, "doc_id", "text", n=5
        ).collect()
    }
    assert rep == {"HuggingFaceH4/MATH-500": 1, "my/quiz": 1}
    # schema validation errors are explicit
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing columns"):
        eval_texts(
            EVAL_BENCHMARKS["Idavidrein/gpqa"],
            spark.createDataFrame([("x",)], "wrong string"),
        )


def test_benchmark_per_threshold_overrides(spark):
    """VERDICT r3 #9: registry ngram_n / min_jaccard override the caller
    defaults per benchmark (the reference's 114k-vs-DCFT threshold split)."""
    from open_thoughts_spark.operators.decontaminate import (
        EVAL_BENCHMARKS,
        EvalBenchmark,
        benchmark_contamination_report,
        register_benchmark,
    )

    pool = spark.createDataFrame(
        [
            # shares a 3-gram but NOT a 5-gram with the eval text
            (1, "alpha beta gamma nothing else here at all today"),
            (2, "completely disjoint words with zero overlap whatsoever"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], "text string"
    )
    try:
        register_benchmark(EvalBenchmark("fx/loose", ("text",)))
        register_benchmark(EvalBenchmark("fx/strict", ("text",), ngram_n=5))
        rep = {
            r["benchmark"]: r["contaminated_count"]
            for r in benchmark_contamination_report(
                pool, {"fx/loose": ev, "fx/strict": ev}, "doc_id", "text", n=3
            ).collect()
        }
        # same eval set, same call: the 5-gram benchmark sees no hit
        assert rep == {"fx/loose": 1, "fx/strict": 0}
    finally:
        EVAL_BENCHMARKS.pop("fx/loose", None)
        EVAL_BENCHMARKS.pop("fx/strict", None)


def test_lcs_duckdb_recursion_parity_fuzz():
    """The REAL rouge_seed_filter oracle (SQL_ROUGE_SEED_FILTER, not a
    copy) must agree with the Python ROUGE-L path on crafted documents —
    including empty/whitespace texts (n=0 or m=0 pairs skip the recursion
    and take the coalesce(max,0) branch) and heavy repetition."""
    import random

    import duckdb
    import numpy as np

    import __spark_entry__ as entrymod
    from open_thoughts_spark.operators.rouge import rouge_l_f1, rouge_tokens

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "xx22"]
    texts = []
    for i in range(40):
        n = rng.randint(0, 15)
        texts.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    texts[2] = (2, "")          # empty seed
    texts[7] = (7, "   ")       # whitespace-only pool doc (tokenless)
    texts[9] = (9, texts[0][1])  # exact dup of seed 0
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany("insert into documents values (?, ?)", texts)
    got = dict(
        con.execute(entrymod.oracle_sql()["rouge_seed_filter"]).fetchall()
    )
    seeds = [rouge_tokens(t) for d, t in texts if d < 5]
    for d, t in texts:
        if d < 5:
            continue
        toks = rouge_tokens(t)
        f1 = max((rouge_l_f1(toks, s) for s in seeds), default=0.0)
        want = int(np.floor(1_000_000 * f1))
        assert got[d] == want, (d, t, got[d], want)
    assert got[9] == 1_000_000  # exact dup of a seed
    assert got[7] == 0          # tokenless doc scores zero
