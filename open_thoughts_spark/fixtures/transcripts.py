"""Deterministic, fully distributed synthetic transcripts generator.

Produces the exact input shape mandated by BASELINE.json ``input_hint``:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Design for 10^12-turn scale: generation is ``spark.range(n_convs)`` followed
by pure column expressions — every value is a deterministic function of
``(seed, conv index, turn index)`` via ``xxhash64``, so the same table can be
generated at any scale on any cluster with zero driver-side data and zero
Python. Conversation lengths are skewed on purpose (~1% "hot" conversations
own a large share of turns, FIXTURES.md stratum 9) so downstream skew
handling is load-bearing.

Content strata (FIXTURES.md strata 1-12) are interleaved by hash so every
reference rule family fires; see fixtures/corpus.py for the template banks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from open_thoughts_spark.fixtures import corpus

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def _h(*cols: Column | str | int) -> Column:
    """Non-negative deterministic hash of the given columns/literals."""
    prepared = [c if isinstance(c, Column) else F.lit(c) for c in cols]
    return F.abs(F.xxhash64(*prepared))


def _pick(bank: list[str], key: Column) -> Column:
    """Deterministically pick one literal from a template bank."""
    arr = F.array(*[F.lit(t) for t in bank])
    return F.element_at(arr, (key % len(bank) + 1).cast("int"))


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 600,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame (unordered physical layout)."""
    convs = spark.range(n_convs).withColumnRenamed("id", "cid")
    hlen = _h("len", F.col("cid"), seed)
    # ~1% hot conversations with 200-1000 turns; the rest 1-40 (geometric-ish)
    conv_len = (
        F.when(hlen % 100 == 0, (200 + _h("hot", F.col("cid"), seed) % 800))
        .otherwise(1 + hlen % 40)
        .cast("int")
    )
    convs = convs.withColumn("conv_len", conv_len)
    turns = convs.select(
        "cid",
        F.explode(F.sequence(F.lit(0), F.col("conv_len") - 1)).alias("turn_idx"),
    )

    cid, idx = F.col("cid"), F.col("turn_idx")
    hrole = _h("role", cid, idx, seed)
    hstrat = _h("stratum", cid, idx, seed)
    htext = _h("text", cid, idx, seed)

    role = (
        F.when((idx == 0) & (hrole % 5 == 0), F.lit("system"))
        .when((idx > 1) & (hrole % 11 == 0), F.lit("tool"))
        .when(idx % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    # --- per-stratum text builders (all native exprs) ---
    email = F.concat(F.lit("user"), (htext % 997).cast("string"), F.lit("@example.com"))
    phone = F.concat(F.lit("+1-555-"), F.lpad((htext % 10000).cast("string"), 4, "0"))
    key = F.concat(F.lit("sk-"), F.substring(F.md5(htext.cast("string")), 1, 16))
    pii_text = _pick(corpus.PII_TEMPLATES, htext)
    pii_text = F.replace(pii_text, F.lit("{email}"), email)
    pii_text = F.replace(pii_text, F.lit("{phone}"), phone)
    pii_text = F.replace(pii_text, F.lit("{key}"), key)

    long_text = F.concat(
        _pick(corpus.LONG_FILLER, htext),
        F.lit(" "),
        F.repeat(
            F.concat_ws(" ", *[F.lit(s) for s in corpus.LONG_FILLER[:8]]), 2
        ),
    )
    rep_word = _pick(corpus.REPEATED_WORDS, htext)
    repetition_text = F.rtrim(F.repeat(F.concat(rep_word, F.lit(" ")), 25))

    lang_arr = sorted(corpus.NON_ENGLISH)  # de, es, fr, zh — deterministic order
    nonen_text = F.element_at(
        F.array(
            *[
                _pick(corpus.NON_ENGLISH[lang], _h("ne", cid, idx, seed, lang))
                for lang in lang_arr
            ]
        ),
        (htext % len(lang_arr) + 1).cast("int"),
    )

    strat = hstrat % 100
    content_text = (
        F.when(strat < 55, _pick(corpus.CLEAN_SENTENCES, htext))
        .when(strat < 63, nonen_text)
        .when(strat < 69, _pick(corpus.BOILERPLATE, htext))
        .when(strat < 73, _pick(corpus.SHORT_TEXTS, htext))
        .when(strat < 77, long_text)
        .when(strat < 82, repetition_text)
        .when(strat < 87, _pick(corpus.SYMBOL_TEXTS, htext))
        .when(strat < 93, pii_text)
        .when(strat < 96, _pick(corpus.WSJUNK_TEXTS, htext))
        .when(strat < 98, _pick(corpus.GIBBERISH_TEXTS, htext))
        .otherwise(_pick(corpus.DUP_TEXTS, htext))
    )

    text = (
        F.when(role == "tool", _pick(corpus.TOOL_TEXTS, htext))
        .when(role == "system", _pick(corpus.SYSTEM_TEXTS, htext))
        .otherwise(content_text)
    )
    tool = F.when(role == "tool", _pick(corpus.TOOL_NAMES, _h("tool", cid, idx, seed)))

    # strictly increasing within a conversation: base + per-conv offset + idx step
    ts = F.timestamp_seconds(
        F.lit(1735689600)  # 2025-01-01T00:00:00Z
        + (_h("t0", cid, seed) % 86400 * 30)
        + idx.cast("long") * (3 + _h("step", cid, seed) % 57)
    )

    df = turns.select(
        F.concat(F.lit("conv-"), F.lpad(cid.cast("string"), 8, "0")).alias("conv_id"),
        idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

    # shuffle the physical order (FIXTURES.md stratum 10) so stable-ordering
    # windows are load-bearing; deterministic: sort by a hash, not rand()
    nparts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return (
        df.repartition(nparts, _h("shuffle", F.col("conv_id"), F.col("turn_idx"), seed))
        .sortWithinPartitions(_h("order", F.col("conv_id"), F.col("turn_idx"), seed))
    )


def write_transcripts(
    spark: SparkSession, path: str, n_convs: int = 600, seed: int = 42
) -> str:
    generate_transcripts(spark, n_convs=n_convs, seed=seed).write.mode(
        "overwrite"
    ).parquet(path)
    return path
