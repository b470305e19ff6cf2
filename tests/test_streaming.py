"""Streaming surface: availableNow drain matches the batch pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_thoughts_spark.pipeline import quality_filter
from open_thoughts_spark.streaming import (
    read_transcripts_stream,
    stream_quality_filter,
    streaming_drop_metrics,
)


def test_stream_matches_batch(spark, transcripts_path, tmp_path):
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_transcripts_stream(spark, transcripts_path, max_files_per_trigger=4)
    q = stream_quality_filter(stream, out_path, ckpt)
    q.awaitTermination(300)

    streamed = spark.read.parquet(out_path)
    batch = quality_filter(
        spark.read.parquet(transcripts_path), with_turn_order=False
    ).filter(F.col("keep"))
    assert streamed.count() == batch.count()
    skeys = set(
        (r["conv_id"], r["turn_idx"]) for r in streamed.select("conv_id", "turn_idx").collect()
    )
    bkeys = set(
        (r["conv_id"], r["turn_idx"]) for r in batch.select("conv_id", "turn_idx").collect()
    )
    assert skeys == bkeys


def test_streaming_metrics_plan_is_streaming(spark, transcripts_path):
    stream = read_transcripts_stream(spark, transcripts_path)
    agg = streaming_drop_metrics(stream, window="1 hour", watermark="2 hours")
    assert agg.isStreaming
    assert set(agg.columns) == {"time_window", "reason", "rows"}


def test_stream_exact_dedup_drops_repeats(spark, tmp_path):
    """Streaming dedup keeps the first occurrence of each normalized text
    per conversation and drops later repeats, matching the batch
    exact-dedup decision set."""
    import pandas as pd

    from open_thoughts_spark.streaming.pipeline import stream_exact_dedup

    src = tmp_path / "in"
    src.mkdir()
    rows = [
        ("c1", 0, "user", "hello there"),
        ("c1", 1, "assistant", "Hello   THERE"),  # dup after normalize
        ("c1", 2, "user", "something else"),
        ("c2", 0, "user", "hello there"),  # same text, other conversation
    ]
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).coalesce(1).write.parquet(str(src / "batch0"))
    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string"
        ).parquet(str(src / "*"))
    )
    out = stream_exact_dedup(stream, key_cols=["conv_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in spark.sql("select * from dedup_sink").collect()
    )
    assert got == [("c1", 0), ("c1", 2), ("c2", 0)]


def test_stream_decontaminate_is_stateless_filter(spark, tmp_path):
    from open_thoughts_spark.streaming.pipeline import stream_decontaminate

    src = tmp_path / "in2"
    src.mkdir()
    rows = [
        (1, "the quick brown fox jumps over fences"),
        (2, "completely unrelated sentence about shuffles"),
    ]
    spark.createDataFrame(rows, "doc_id int, text string").coalesce(1).write.parquet(
        str(src / "b0")
    )
    evals = spark.createDataFrame(
        [("the quick brown fox runs",)], "question string"
    )
    stream = spark.readStream.schema("doc_id int, text string").parquet(str(src / "*"))
    out = stream_decontaminate(stream, evals, eval_text_col="question", n=3)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("decon_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    got = [r["doc_id"] for r in spark.sql("select * from decon_sink").collect()]
    assert got == [2]


def test_stream_minhash_candidates_flags_neardups(spark, tmp_path):
    """Streaming LSH band store: later near-dups of an earlier doc emit
    candidate rows; novel docs don't. Band keys replay the batch kernel
    bit-for-bit."""
    import pandas as pd  # noqa: F401

    from open_thoughts_spark.operators import dedup
    from open_thoughts_spark.streaming.pipeline import stream_minhash_candidates

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base + " again"          # shares most shingles -> band collision
    other = "completely different content with no overlapping word grams at all whatsoever"
    rows = [
        (1, base, "2026-01-01 10:00:00"),
        (2, near, "2026-01-01 10:05:00"),
        (3, other, "2026-01-01 10:06:00"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(str(src / "*"))
    cands = stream_minhash_candidates(
        stream, "doc_id", "text", "ts", watermark="1 hour"
    )
    assert cands.isStreaming
    q = (
        cands.writeStream.format("memory")
        .queryName("mh_cands")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from mh_cands").collect()
    flagged = {r["doc_id"] for r in got}
    assert flagged == {"2"}
    assert all(r["first_doc_id"] == "1" for r in got)

    # band keys match the batch lsh_bands kernel exactly
    batch_bands = dedup.lsh_bands(
        dedup.minhash_signature(df, "doc_id", "text", num_perm=8, shingle_n=3),
        "doc_id", bands=4, rows_per_band=2,
    )
    batch_keys = {
        (str(r["doc_id"]), r["band_idx"], r["band_key"])
        for r in batch_bands.collect()
    }
    for r in got:
        assert (r["doc_id"], r["band_idx"], r["band_key"]) in batch_keys


def test_stream_band_keys_match_batch_on_messy_whitespace(spark):
    """Band-key parity with the batch kernel on whitespace-hostile text:
    F.trim strips only spaces and F.split keeps boundary empty tokens, so
    the streaming UDF must replicate both (code-review r4 caught a Python
    .strip()/.split() desync on leading tabs / trailing newlines)."""
    from open_thoughts_spark.operators import dedup
    from open_thoughts_spark.streaming.pipeline import _minhash_band_rows

    texts = [
        "\tthe quick brown fox jumps \t over the lazy dog today\n",
        "plain single spaced words here for the baseline case",
        "  leading spaces get trimmed  ",
        "UPPER Case Mixed\nnewline separated words in the text",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    stream_keys = {
        (str(r["doc_id"]), r["b"]["band_idx"], r["b"]["band_key"])
        for r in df.select(
            "doc_id",
            F.explode(_minhash_band_rows("text", 8, 3, 4, 2)).alias("b"),
        ).collect()
    }
    batch_keys = {
        (str(r["doc_id"]), r["band_idx"], r["band_key"])
        for r in dedup.lsh_bands(
            dedup.minhash_signature(df, "doc_id", "text", num_perm=8, shingle_n=3),
            "doc_id", bands=4, rows_per_band=2,
        ).collect()
    }
    assert stream_keys == batch_keys


def test_interval_ms_compound_and_errors():
    """Watermark TTL parser accepts the compound interval forms
    withWatermark itself accepts (ADVICE r5)."""
    import pytest

    from open_thoughts_spark.streaming.pipeline import _interval_ms

    assert _interval_ms("10 minutes") == 600_000
    assert _interval_ms("1 hour 30 minutes") == 5_400_000
    assert _interval_ms("2 days 3 hours 4 minutes 5 seconds") == (
        2 * 86_400_000 + 3 * 3_600_000 + 4 * 60_000 + 5_000
    )
    assert _interval_ms("1 week") == 604_800_000
    assert _interval_ms("500 microseconds") == 0  # sub-ms rounds down
    with pytest.raises(ValueError, match="pairs"):
        _interval_ms("10")
    with pytest.raises(ValueError, match="unit"):
        _interval_ms("10 fortnights")


def test_stream_minhash_verified_matches_batch(spark, tmp_path):
    """VERDICT r5 #3: the foreachBatch verify composition — streaming
    confirmed near-dups must equal the batch path (candidate_pairs +
    exact-Jaccard verify) on the same data: band keys are bit-exact, the
    verify kernel is the same function, so the verdicts must match
    exactly. Fixture includes a band-colliding-but-low-Jaccard pair to
    prove verification actually rejects (collision alone over-flags)."""
    from open_thoughts_spark.operators import dedup
    from open_thoughts_spark.streaming.pipeline import stream_minhash_verified

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base, "2026-01-01 10:00:00"),
        (2, base + " again", "2026-01-01 10:01:00"),  # confirm: j=0.923
        # collides with 1/2 but jaccard 0.39-0.41 -> rejected by verify
        (11, "a quick brown fox jumps over the lazy dog by another river bank today",
         "2026-01-01 10:02:00"),
        (13, "some quick brown fox jumps over the lazy dog near the river dock today",
         "2026-01-01 10:03:00"),  # confirm vs 1: j=0.6
        (14, "the quick brown fox jumps over the lazy cat near the river bank sunday",
         "2026-01-01 10:04:00"),  # collides w/ 13 at j=0.333 -> rejected
        (3, "completely different content with no overlapping word grams at all whatsoever",
         "2026-01-01 10:05:00"),  # novel
    ]
    src = tmp_path / "in"
    src.mkdir()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(str(src / "*"))

    confirmed_rows = []

    def sink(cdf, epoch_id):
        confirmed_rows.extend(cdf.collect())

    writer = stream_minhash_verified(
        stream, "doc_id", "text", "ts",
        texts=lambda: df, sink=sink, min_jaccard=0.5, watermark="1 hour",
    )
    q = writer.trigger(availableNow=True).option(
        "checkpointLocation", str(tmp_path / "ck")
    ).start()
    q.awaitTermination(300)

    stream_confirmed = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in confirmed_rows
    }

    # batch path on the same data: band candidates -> same Jaccard verify
    bands = dedup.lsh_bands(
        dedup.minhash_signature(df, "doc_id", "text", num_perm=8, shingle_n=3),
        "doc_id", bands=4, rows_per_band=2,
    )
    cand = dedup.candidate_pairs(bands, "doc_id")
    batch_confirmed = {}
    for r in dedup.jaccard_pairs(
        df, "doc_id", "text", shingle_n=3, min_jaccard=0.5, pairs=cand
    ).collect():
        a, b = sorted([str(r["id_a"]), str(r["id_b"])])
        batch_confirmed[(a, b)] = round(r["jaccard"], 9)

    # the streaming band store only pairs against the bucket's FIRST doc
    # (bounded state), so its candidate set is a subset of the batch
    # all-in-bucket pairs — confirmed pairs must be a subset with
    # IDENTICAL jaccard verdicts (same verify kernel, bit-exact bands)
    assert set(stream_confirmed) <= set(batch_confirmed)
    for pair, j in stream_confirmed.items():
        assert batch_confirmed[pair] == j
    assert {("1", "2"), ("1", "13")} <= set(stream_confirmed)
    # the low-jaccard collisions were candidates yet confirmed nowhere
    assert ("1", "11") not in stream_confirmed
    assert ("1", "11") not in batch_confirmed


def test_cli_streaming_requires_output():
    import pytest

    from open_thoughts_spark.__main__ import main

    with pytest.raises(SystemExit):
        main(["--input", "/nonexistent", "--streaming"])


def test_catalog_foreach_batch_appender_exactly_once(spark, tmp_path):
    """The catalog streaming sink must commit each micro-batch once: a
    replayed batch id (Structured Streaming's failure contract) is a
    no-op, non-stream writes carry the committed id forward, and the
    snapshot history shows one append per batch."""
    from open_thoughts_spark.sources.snapshots import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "w"))
    sink = cat.foreach_batch_appender("events")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    b1 = spark.createDataFrame([(3, "c")], "id int, v string")
    sink(b0, 0)
    sink(b1, 1)
    assert cat.read(spark, "events").count() == 3
    # replay after simulated failure: batch 1 arrives again -> skipped
    sink(b1, 1)
    assert cat.read(spark, "events").count() == 3
    assert cat.append_batch(b1, "events", 0) is None  # older batch too
    # a fresh batch commits
    assert cat.append_batch(b1, "events", 2) is not None
    assert cat.read(spark, "events").count() == 4
    # an interleaved BATCH append inherits the stream position
    cat.write(spark.createDataFrame([(9, "z")], "id int, v string"), "events")
    assert cat.append_batch(b1, "events", 2) is None  # still deduped
    assert cat.append_batch(b1, "events", 3) is not None
    assert cat.read(spark, "events").count() == 6


def test_stream_quality_filter_catalog_sink(spark, transcripts_path, tmp_path):
    """Streaming QF through the exactly-once catalog sink: kept totals
    equal the batch pipeline, a rerun over unchanged input adds no rows
    and mints no snapshot."""
    from open_thoughts_spark.pipeline import quality_filter as batch_qf
    from open_thoughts_spark.sources.snapshots import SnapshotCatalog
    from open_thoughts_spark.streaming.pipeline import (
        read_transcripts_stream,
        stream_quality_filter,
    )

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    ckpt = str(tmp_path / "ck")

    def drain():
        q = stream_quality_filter(
            read_transcripts_stream(spark, transcripts_path),
            str(tmp_path / "unused"),
            ckpt,
            langid_mode="udf",
            catalog=cat,
            catalog_table="kept",
        )
        q.awaitTermination()

    drain()
    n1 = cat.read(spark, "kept").count()
    s1 = cat.current_snapshot("kept")
    batch_kept = (
        batch_qf(
            spark.read.parquet(transcripts_path),
            langid_mode="udf",
            with_turn_order=False,
        )
        .filter(F.col("keep"))
        .count()
    )
    assert n1 == batch_kept > 0
    drain()  # unchanged input: file-source checkpoint yields no batches
    assert cat.read(spark, "kept").count() == n1
    assert cat.current_snapshot("kept") == s1
