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
