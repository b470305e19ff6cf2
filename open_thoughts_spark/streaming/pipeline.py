"""Structured Streaming surface of the quality-filter engine.

The reference is purely batch (SURVEY.md §2.4: no streams anywhere); this
module is the additive capability a transcript firehose needs: the SAME
per-turn scoring/decision/scrub expressions run under ``readStream`` —
every per-turn step is a narrow transformation, so the batch plan is reused
verbatim — plus watermarked event-time aggregation for the drop-reason
metrics (late turns tolerated up to the watermark).

Checkpointing here is Spark's own streaming checkpoint (offsets + state),
complementary to the batch stage-hash manifest in pipeline/checkpoint.py.

Ordering note: global ``turn_rank`` windows don't exist in streaming — turn
order is an ingest-time property (``turn_idx`` is already the order), so the
streaming surface simply carries ``turn_idx`` through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_thoughts_spark.fixtures.transcripts import SCHEMA_DDL
from open_thoughts_spark.pipeline.quality_filter import RESULT_COLUMNS, quality_filter


def read_transcripts_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a growing transcripts directory (the sandbox
    stand-in for a Kafka/Kinesis turn firehose; swap ``format``)."""
    return (
        spark.readStream.schema(SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_quality_filter(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_path: str,
    langid_mode: str = "native",
    available_now: bool = True,
):
    """Score → decide → scrub on the stream; append kept turns to parquet.

    ``available_now=True`` drains everything currently in the source and
    stops — the testable/batch-catchup trigger; continuous deployments drop
    it for the default micro-batch trigger."""
    decided = quality_filter(
        stream_df, langid_mode=langid_mode, with_turn_order=False
    ).select(*RESULT_COLUMNS)
    writer = (
        decided.filter(F.col("keep"))
        .drop("keep", "drop_reason")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_drop_metrics(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    langid_mode: str = "native",
) -> DataFrame:
    """Watermarked event-time drop-reason metrics: one row per
    (time window, reason). Late turns beyond the watermark are dropped from
    the aggregation state — bounded state at firehose scale."""
    decided = quality_filter(
        stream_df, langid_mode=langid_mode, with_turn_order=False
    )
    return (
        decided.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("time_window"),
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason"),
        )
        .agg(F.count("*").alias("rows"))
    )
